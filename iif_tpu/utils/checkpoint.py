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


def store_model_weights(state: Any, out_dir: str,
                        prefix: str = "model") -> str:
    """Release-weights export with sha256 content naming (reference
    ``classification/utils.py:325-390``): strips training state down to
    model weights, writes ``<prefix>-<sha256[:8]>.npz``."""
    import hashlib
    import io

    weights = {}
    flat = jax.tree_util.tree_flatten_with_path(
        {"params": state["params"] if isinstance(state, dict)
         else state.params,
         "batch_stats": state.get("batch_stats", {})
         if isinstance(state, dict) else state.batch_stats})[0]
    for path, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        weights[key] = np.asarray(leaf)
    buf = io.BytesIO()
    np.savez(buf, **weights)
    digest = hashlib.sha256(buf.getvalue()).hexdigest()[:8]
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{prefix}-{digest}.npz")
    with open(out_path, "wb") as f:
        f.write(buf.getvalue())
    return out_path


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
