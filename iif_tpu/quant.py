"""Int8 quantization-aware training, TPU-native.

Rebuild of the capability of ``classification/train_quantization.py`` (the
torchvision QAT recipe: fuse -> prepare_qat -> observers/fake-quant,
observer freeze after N epochs, BN freeze after M epochs, plus
post-training calibration) in the AQT style: symmetric int8 fake-quant
with straight-through gradients applied to the parameter pytree inside the
jitted step. No graph rewriting — the quantized train step is the same XLA
program with a quantize-dequantize epilogue on each weight.

Semantics mapping:
- torch observers (EMA min/max)            -> per-channel absmax scales,
  recomputed each step while "observing", frozen into the state after
  ``freeze_observer_epoch`` (matching disable_observer);
- freeze_bn_stats after M epochs           -> forward with running BN
  stats (the trainer flips its ``train`` flag for BN);
- convert() int8 eval                      -> ``quantize_tree`` returns
  int8 weights + scales; ``dequantize_tree`` reproduces the fake-quant
  numerics exactly, so fake-quant eval == converted-int8 eval.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@jax.custom_vjp
def fake_quant(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    q = jnp.clip(jnp.round(x / scale), -128, 127)
    return q * scale


def _fq_fwd(x, scale):
    return fake_quant(x, scale), None


def _fq_bwd(_, g):
    return g, None  # straight-through estimator


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def weight_scale(w: jnp.ndarray, per_channel: bool = True) -> jnp.ndarray:
    """Symmetric absmax scale; per-channel over the last axis for
    kernels (HWIO / (in, out))."""
    if per_channel and w.ndim >= 2:
        absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)),
                         keepdims=True)
    else:
        absmax = jnp.max(jnp.abs(w))
    return jnp.maximum(absmax, 1e-8) / 127.0


def _is_quantizable(path, leaf) -> bool:
    name = getattr(path[-1], "key", "")
    return name == "kernel" and leaf.ndim >= 2


def fake_quant_params(params: Any, scales: Optional[Any] = None,
                      per_channel: bool = True) -> Any:
    """Fake-quantize every conv/dense kernel in the tree (STE grads).

    ``scales``: frozen scales pytree (observer-freeze mode); None =
    recompute from the live weights (observing mode).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    scale_flat = None
    if scales is not None:
        scale_flat = [s for _, s in
                      jax.tree_util.tree_flatten_with_path(scales)[0]]
    out = []
    for i, (path, leaf) in enumerate(flat):
        if _is_quantizable(path, leaf):
            s = (scale_flat[i] if scale_flat is not None
                 else weight_scale(leaf, per_channel))
            s = jax.lax.stop_gradient(s)
            out.append(fake_quant(leaf, s))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def observe_scales(params: Any, per_channel: bool = True) -> Any:
    """Snapshot current per-kernel scales (freeze-observer moment)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef,
        [weight_scale(l, per_channel) if _is_quantizable(p, l)
         else jnp.zeros(()) for p, l in flat])


def quantize_tree(params: Any, scales: Optional[Any] = None
                  ) -> Tuple[Any, Any]:
    """Convert: kernels -> int8 + their scales (deployment artifact)."""
    if scales is None:
        scales = observe_scales(params)
    flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_s = [s for _, s in jax.tree_util.tree_flatten_with_path(scales)[0]]
    treedef = jax.tree_util.tree_structure(params)
    q = []
    for (path, leaf), s in zip(flat_p, flat_s):
        if _is_quantizable(path, leaf):
            q.append(jnp.clip(jnp.round(leaf / s), -128, 127)
                     .astype(jnp.int8))
        else:
            q.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, q), scales


def dequantize_tree(qparams: Any, scales: Any) -> Any:
    flat_q = jax.tree_util.tree_flatten_with_path(qparams)[0]
    flat_s = [s for _, s in jax.tree_util.tree_flatten_with_path(scales)[0]]
    treedef = jax.tree_util.tree_structure(qparams)
    out = []
    for (path, leaf), s in zip(flat_q, flat_s):
        if leaf.dtype == jnp.int8:
            out.append(leaf.astype(jnp.float32) * s)
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


class QatConfig(NamedTuple):
    enabled: bool = False
    freeze_observer_epoch: int = 4   # torchvision recipe: epoch >= 4
    freeze_bn_epoch: int = 2         # torchvision recipe: epoch >= 2
    per_channel: bool = True
