"""Orbax-backed checkpointing.

Replaces the reference's torch.save dict checkpoints
(``classification/train.py:265-277``: per-epoch ``model_{e}`` + rolling
``checkpoint``; resume restores model/optimizer/scheduler/epoch
``train.py:236-241``; ``--load_from`` = weights only ``:243-245``) with an
Orbax CheckpointManager — multi-host safe, atomic, and preemption-friendly
(the idiomatic TPU answer to the reference's missing elastic recovery,
SURVEY.md §5.3).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(os.path.expanduser(directory))
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state), force=force)
        self._mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if template is not None:
            return self._mngr.restore(
                step, args=ocp.args.StandardRestore(template))
        return self._mngr.restore(step)

    def close(self) -> None:
        self._mngr.close()


def load_weights(path_or_dir: str, template: Any = None) -> Any:
    """`--load_from`: restore weights only from a checkpoint dir."""
    mngr = CheckpointManager(path_or_dir)
    try:
        return mngr.restore(template=template)
    finally:
        mngr.close()


def average_checkpoints(trees) -> Any:
    """Average model weights across checkpoints (reference
    ``classification/utils.py:269-322``)."""
    trees = list(trees)
    n = len(trees)
    return jax.tree_util.tree_map(
        lambda *xs: sum(np.asarray(x, dtype=np.float64) for x in xs) / n
        if np.issubdtype(np.asarray(xs[0]).dtype, np.floating)
        else xs[0],
        *trees)
