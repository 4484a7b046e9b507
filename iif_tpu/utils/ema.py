"""Exponential moving average of parameters — functional rebuild of the
reference's EMA hook (``mmdet/core/hook/ema.py``): shadow params updated as
``ema = (1 - m) * ema + m * params`` every ``interval`` steps, swappable
for eval.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def init_ema(params: Any) -> Any:
    return jax.tree_util.tree_map(jnp.asarray, params)


def update_ema(ema: Any, params: Any, momentum: float = 0.0002) -> Any:
    return jax.tree_util.tree_map(
        lambda e, p: (1.0 - momentum) * e + momentum * p, ema, params)
