"""Focal / one-hot-BCE loss (reference ``classification/custom.py:42-89``).

gamma == 0 -> BCE-with-logits on one-hot targets (the `--classif bce` path);
gamma  > 0 -> focal loss on sigmoid probabilities with optional alpha.
Optional per-class ``weights`` (deferred re-weighting) multiply the (B, C)
loss matrix broadcast over the class axis, exactly as the reference's
``loss *= self.weights`` with weights shaped (1, C).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from iif_tpu.registry import LOSSES


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise BCE with logits (torch formula)."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


@LOSSES.register()
@dataclasses.dataclass
class FocalLoss:
    gamma: float = 0.0
    alpha: Optional[float] = None
    reduction: str = "mean"
    weights: Optional[jnp.ndarray] = None  # (C,) per-class weights

    def __call__(self, logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        num_classes = logits.shape[-1]
        y = jax.nn.one_hot(targets, num_classes, dtype=jnp.float32)
        logits = logits.astype(jnp.float32)
        batch = targets.shape[0]

        if self.gamma == 0:
            loss = _bce_with_logits(logits, y)
            if self.weights is not None:
                loss = loss * self.weights.astype(loss.dtype)[None, :]
            # reference: 'sum' divides by batch size (custom.py:68-69)
            if self.reduction == "sum":
                return loss.sum() / batch
            return loss.mean()

        p = jax.nn.sigmoid(logits)
        eps = 1e-12
        loss = -(y * jnp.log(jnp.clip(p, eps, 1.0))
                 + (1.0 - y) * jnp.log(jnp.clip(1.0 - p, eps, 1.0)))
        p_t = p * y + (1.0 - p) * (1.0 - y)
        loss = loss * (1.0 - p_t) ** self.gamma
        if self.weights is not None:
            loss = loss * self.weights.astype(loss.dtype)[None, :]
        if self.alpha is not None:
            alpha_t = self.alpha * y + (1.0 - self.alpha) * (1.0 - y)
            loss = alpha_t * loss
        if self.reduction == "sum":
            return loss.sum() / batch
        return loss.mean()


jax.tree_util.register_pytree_node(
    FocalLoss,
    lambda l: ((l.weights,), (l.gamma, l.alpha, l.reduction)),
    lambda aux, children: FocalLoss(aux[0], aux[1], aux[2], children[0]),
)
