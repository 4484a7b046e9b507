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


def _bilinear_gather(feat: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray
                     ) -> jnp.ndarray:
    """feat (H, W, C); y, x (...,) float coords -> (..., C) bilinear taps.
    Out-of-range coords clamp (matching the CUDA kernel's zero-pad then
    clamp behaviour for the interior; fully-outside taps contribute the
    border value, negligible for valid RoIs)."""
    h, w, _ = feat.shape
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0.astype(y.dtype))[..., None]
    lx = (x - x0.astype(x.dtype))[..., None]
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
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

    def _one(b, ys_r, xs_r):
        feat = features[b]
        yy = jnp.broadcast_to(ys_r[:, None], (out_h * s, out_w * s))
        xx = jnp.broadcast_to(xs_r[None, :], (out_h * s, out_w * s))
        taps = _bilinear_gather(feat, yy, xx)          # (oh*s, ow*s, C)
        taps = taps.reshape(out_h, s, out_w, s, -1)
        return taps.mean(axis=(1, 3))                  # (oh, ow, C)

    return jax.vmap(_one)(batch_idx, ys, xs)
