"""Mixup (reference ``classification/custom.py:91-117``), functional.

The reference draws lambda ~ Beta(alpha, alpha) on the host and permutes the
batch on device. Here both happen inside the jitted step from an explicit
PRNG key — no host round-trip, fully fused with the forward pass.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def mixup_batch(
    key: jax.Array, x: jnp.ndarray, y: jnp.ndarray, alpha: float = 1.0
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (mixed_x, y_a, y_b, lam)."""
    k_lam, k_perm = jax.random.split(key)
    if alpha > 0:
        lam = jax.random.beta(k_lam, alpha, alpha)
    else:
        lam = jnp.float32(1.0)
    index = jax.random.permutation(k_perm, x.shape[0])
    mixed_x = lam * x + (1.0 - lam) * x[index]
    return mixed_x, y, y[index], lam


def mixup_criterion(
    criterion: Callable, logits: jnp.ndarray,
    y_a: jnp.ndarray, y_b: jnp.ndarray, lam: jnp.ndarray
) -> jnp.ndarray:
    return lam * criterion(logits, y_a) + (1.0 - lam) * criterion(logits, y_b)


class Mixup:
    """Object form mirroring the reference API."""

    def __init__(self, criterion: Callable, alpha: float = 1.0):
        self.criterion = criterion
        self.alpha = alpha

    def __call__(self, key, x, y):
        return mixup_batch(key, x, y, self.alpha)

    def mixup_criterion(self, logits, y_a, y_b, lam):
        return mixup_criterion(self.criterion, logits, y_a, y_b, lam)
