"""Batch normalization variants for the TPU rebuild.

The reference trains with **per-GPU local BN** — torch's default; SyncBN
is opt-in and never enabled in its published recipes (reference
``classification/train.py:190-191`` guards
``convert_sync_batchnorm`` behind ``args.sync_bn``, and the detection
configs, e.g. ``experiments/iif/iif_r50_4x4_1x/iif_r50_4x4_1x.py``, keep
``norm_cfg=dict(type='BN')``).  Under SPMD jit the natural reduction is
the *global* sharded batch (XLA inserts the cross-device collective
automatically), i.e. SyncBN semantics.  ``LocalBatchNorm`` restores the
reference's training dynamics: statistics reduce only within
``groups`` equal slices of the leading batch axis.  When ``groups``
matches the data-parallel mesh size and the batch axis is sharded over
it, each group lives entirely on one device, the reshape is local, and
XLA emits **no collective** — exactly per-device BN, with the side
benefit of removing BN's all-reduce from the step.

Variable layout matches ``flax.linen.BatchNorm`` exactly (params
``scale``/``bias``; batch_stats ``mean``/``var``), so checkpoints,
pretrained-torch ingestion and the sync variant are interchangeable.
Running buffers are shared across groups and updated with the
across-group average of the per-group statistics — the single-buffer
analog of torch DDP, where each replica holds its own buffers and rank-0's
(an unbiased sample of the same average) is what gets checkpointed.

Norm spec strings (plumbed through every model's ``norm: str`` attr):
  ``"bn"``     global/sync batch statistics (round-1..4 behavior)
  ``"bn@G"``   local BN over G equal batch groups (reference default
               dynamics with G = #data-parallel devices)
  ``"gn"``     GroupNorm(32)
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class LocalBatchNorm(nn.Module):
    """BatchNorm with per-group batch statistics over the leading axis.

    ``groups=1`` degenerates to global-batch (sync) semantics; on a
    single device any grouping only changes the statistics' granularity,
    mirroring what N separate GPUs would each compute locally — which is
    what makes reference-parity experiments reproducible on one chip.
    """

    groups: int = 1
    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    scale_init: Callable = nn.initializers.ones

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", self.scale_init, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        out_dtype = self.dtype or x.dtype

        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = (x.astype(jnp.float32) - ra_mean.value) * inv + bias
            return y.astype(out_dtype)

        b = x.shape[0]
        g = max(int(self.groups), 1)
        if b % g:
            raise ValueError(
                f"LocalBatchNorm: batch {b} not divisible by groups {g}")
        xf = x.astype(jnp.float32).reshape((g, b // g) + x.shape[1:])
        axes = tuple(range(1, xf.ndim - 1))
        gmean = jnp.mean(xf, axis=axes)                       # (g, feat)
        gmean2 = jnp.mean(jax.lax.square(xf), axis=axes)
        gvar = jnp.maximum(gmean2 - jax.lax.square(gmean), 0.0)

        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * gmean.mean(0)
            ra_var.value = m * ra_var.value + (1 - m) * gvar.mean(0)

        bshape = (g,) + (1,) * (xf.ndim - 2) + (feat,)
        inv = jax.lax.rsqrt(gvar + self.epsilon).reshape(bshape)
        y = (xf - gmean.reshape(bshape)) * inv
        y = y.reshape(x.shape) * scale + bias
        return y.astype(out_dtype)


def parse_bn_spec(norm: str) -> int:
    """``"bn"`` -> 0 (global/sync), ``"bn@G"`` -> G local groups."""
    if norm.startswith("bn@"):
        g = int(norm[3:])
        if g < 1:
            raise ValueError(f"bad norm spec {norm!r}")
        return g
    if norm == "bn":
        return 0
    raise ValueError(f"not a bn spec: {norm!r}")
