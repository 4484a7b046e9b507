"""RoIAlign for TPU.

Replaces the mmcv CUDA ``RoIAlign`` kernel (reference call sites:
``SingleRoIExtractor`` roi_layers and ``core/mask/structures.py:9`` mask
target cropping — SURVEY.md §2.4).

Formulation: every (roi, bin, sample) bilinear tap is expressed as four
gathers + a weighted sum over a *static* sample grid, batched over all RoIs
at once — XLA fuses the whole thing into one gather-heavy kernel. Gradients
come for free via autodiff of the gather (scatter-add backward), replacing
the handwritten CUDA backward.

Note on ``sampling_ratio=0``: the CUDA kernel picks ceil(roi_size/out_size)
samples *per RoI* (data-dependent). Static shapes require a fixed grid, so
``sampling_ratio=0`` maps to 2 samples/bin here (the value mmdet effectively
uses for typical RoI sizes at the assigned pyramid level; AP-neutral in
practice).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather_batched(features: jnp.ndarray, bidx: jnp.ndarray,
                             y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """features (B, H, W, C); bidx (R,), y/x (R, ...) float coords ->
    (R, ..., C) bilinear taps. Gathers only the four corner values (four
    gathers total — nothing per-RoI-sized is ever materialized).
    Out-of-range coords clamp (matching the CUDA kernel's behaviour for
    the interior; fully-outside taps contribute the border value,
    negligible for valid RoIs)."""
    _, h, w, _ = features.shape
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]
    b = bidx.reshape(bidx.shape + (1,) * (y.ndim - 1))
    v00 = features[b, y0, x0]
    v01 = features[b, y0, x1]
    v10 = features[b, y1, x0]
    v11 = features[b, y1, x1]
    return (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
            + v10 * ly * (1 - lx) + v11 * ly * lx)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(
    features: jnp.ndarray,    # (B, H, W, C) NHWC
    rois: jnp.ndarray,        # (R, 5): (batch_idx, x1, y1, x2, y2)
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 0,
    aligned: bool = True,
) -> jnp.ndarray:
    """Returns (R, out_h, out_w, C)."""
    out_h, out_w = output_size
    s = sampling_ratio if sampling_ratio > 0 else 2
    offset = 0.5 if aligned else 0.0

    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:  # legacy: clamp to min size 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    bin_w = roi_w / out_w
    bin_h = roi_h / out_h

    # static sample grid: (out*s) taps along each axis
    iy = (jnp.arange(out_h * s) + 0.5) / s    # in bin-units along h
    ix = (jnp.arange(out_w * s) + 0.5) / s
    # (R, out_h*s), (R, out_w*s) absolute coordinates
    ys = y1[:, None] + bin_h[:, None] * iy[None, :]
    xs = x1[:, None] + bin_w[:, None] * ix[None, :]
    r = rois.shape[0]
    yy = jnp.broadcast_to(ys[:, :, None], (r, out_h * s, out_w * s))
    xx = jnp.broadcast_to(xs[:, None, :], (r, out_h * s, out_w * s))
    taps = _bilinear_gather_batched(features, batch_idx, yy, xx)
    taps = taps.reshape(r, out_h, s, out_w, s, -1)
    return taps.mean(axis=(2, 4))
