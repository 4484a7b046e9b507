"""Multi-level RoI feature extraction.

Rebuild of ``mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py``:
FPN level assignment ``lvl = floor(log2(sqrt(area)/56))`` clipped to
[0, L-1] (`:36-55`), then RoIAlign on the assigned level.

TPU-first: instead of the reference's per-level gather/scatter with the
empty-level graph-completion hack (`:86-114`), all pyramid levels are
flattened into ONE (B, sum HW, C) buffer and every RoI's bilinear taps are
computed as flat indices ``offset[lvl] + y * W[lvl] + x`` — a single
4-corner gather for the whole batch of RoIs, no per-level dispatch, no
dense all-level compute. This is ~4x cheaper than running RoIAlign per
level and one-hot selecting (measured 40 ms -> ~10 ms for 1000 RoIs at
LVIS scale on v5e).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def map_roi_levels(rois: jnp.ndarray, num_levels: int,
                   finest_scale: float = 56.0) -> jnp.ndarray:
    """(R, 5) rois -> (R,) target FPN level."""
    scale = jnp.sqrt((rois[:, 3] - rois[:, 1]) * (rois[:, 4] - rois[:, 2]))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


class SingleRoIExtractor:
    """Functional: call with the FPN features and padded rois."""

    def __init__(self, output_size: Tuple[int, int] = (7, 7),
                 featmap_strides: Sequence[int] = (4, 8, 16, 32),
                 sampling_ratio: int = 0, finest_scale: float = 56.0,
                 use_pallas: bool = False):
        self.output_size = tuple(output_size)
        self.featmap_strides = tuple(featmap_strides)
        self.sampling_ratio = sampling_ratio
        self.finest_scale = finest_scale
        # Pallas TPU kernel alternative (per-level dense compute + select;
        # kept for comparison/fallback experiments).
        self.use_pallas = use_pallas

    @property
    def num_inputs(self) -> int:
        return len(self.featmap_strides)

    def __call__(self, feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                 roi_scale_factor: float = None) -> jnp.ndarray:
        """feats: L x (B, H_l, W_l, C); rois (R, 5) = (batch_idx, x1..y2).
        Returns (R, oh, ow, C). ``roi_scale_factor`` rescales each roi
        around its center AFTER level assignment (mmdet
        ``single_level_roi_extractor.py:57-84`` ``roi_rescale`` — used by
        Double-Head's reg branch at 1.3x)."""
        if roi_scale_factor is not None:
            lvls = map_roi_levels(rois, self.num_inputs, self.finest_scale)
            cx = (rois[:, 1] + rois[:, 3]) * 0.5
            cy = (rois[:, 2] + rois[:, 4]) * 0.5
            hw = (rois[:, 3] - rois[:, 1]) * roi_scale_factor * 0.5
            hh = (rois[:, 4] - rois[:, 2]) * roi_scale_factor * 0.5
            rois = jnp.stack([rois[:, 0], cx - hw, cy - hh,
                              cx + hw, cy + hh], axis=1)
            return self._flat_gather(feats, rois, lvls=lvls)
        if self.use_pallas in ("ml", "ml_fast"):
            # single-pass multi-level DMA kernel with a custom-VJP
            # backward (usable in training); falls back off-TPU.
            # "ml_fast" drops the fwd one-hot matmuls to DEFAULT (bf16)
            # precision: ~0.4% rel weight rounding, measurably faster.
            from iif_tpu.ops.pallas.roi_align_kernel import (
                ml_supported, roi_align_pallas_ml)

            # 14x14 with f32 features overflows the ~16 MB scoped-VMEM
            # budget (two window scratches + both branch temporaries);
            # bf16 training features fit. Guard to the flat path there.
            fits_vmem = (self.output_size[0] <= 7
                         or jnp.dtype(feats[0].dtype).itemsize <= 2)
            if (ml_supported(feats[:self.num_inputs]) and fits_vmem
                    and self.output_size[0] == self.output_size[1]):
                return roi_align_pallas_ml(
                    tuple(feats[:self.num_inputs]), rois, self.output_size,
                    self.featmap_strides,
                    self.sampling_ratio if self.sampling_ratio > 0 else 2,
                    self.finest_scale,
                    "default" if self.use_pallas == "ml_fast"
                    else "highest").astype(feats[0].dtype)
            return self._flat_gather(feats, rois)
        if self.use_pallas:
            return self._per_level_pallas(feats, rois)
        return self._flat_gather(feats, rois)

    # ------------------------------------------------------ flat multi-level
    def _flat_gather(self, feats: Sequence[jnp.ndarray], rois: jnp.ndarray,
                     lvls: jnp.ndarray = None) -> jnp.ndarray:
        num_levels = self.num_inputs
        out_h, out_w = self.output_size
        s = self.sampling_ratio if self.sampling_ratio > 0 else 2
        b = feats[0].shape[0]
        c = feats[0].shape[-1]
        r = rois.shape[0]

        if lvls is None:
            lvls = map_roi_levels(rois, num_levels, self.finest_scale)
        heights = np.array([f.shape[1] for f in feats])
        widths = np.array([f.shape[2] for f in feats])
        offsets = np.concatenate([[0], np.cumsum(heights * widths)])[:-1]
        flat = jnp.concatenate(
            [f.reshape(b, -1, c) for f in feats[:num_levels]], axis=1)

        h_l = jnp.asarray(heights, jnp.float32)[lvls]      # (R,)
        w_l = jnp.asarray(widths, jnp.float32)[lvls]
        off_l = jnp.asarray(offsets, jnp.int32)[lvls]
        stride_l = jnp.asarray(self.featmap_strides, jnp.float32)[lvls]
        w_int = jnp.asarray(widths, jnp.int32)[lvls]

        scale = 1.0 / stride_l
        x1 = rois[:, 1] * scale - 0.5
        y1 = rois[:, 2] * scale - 0.5
        x2 = rois[:, 3] * scale - 0.5
        y2 = rois[:, 4] * scale - 0.5
        bin_w = (x2 - x1) / out_w
        bin_h = (y2 - y1) / out_h

        iy = (jnp.arange(out_h * s, dtype=jnp.float32) + 0.5) / s
        ix = (jnp.arange(out_w * s, dtype=jnp.float32) + 0.5) / s
        ys = y1[:, None] + bin_h[:, None] * iy[None, :]    # (R, Ty)
        xs = x1[:, None] + bin_w[:, None] * ix[None, :]    # (R, Tx)
        ys = jnp.clip(ys, 0.0, (h_l - 1.0)[:, None])
        xs = jnp.clip(xs, 0.0, (w_l - 1.0)[:, None])
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        y1i = jnp.minimum(y0 + 1.0, (h_l - 1.0)[:, None])
        x1i = jnp.minimum(x0 + 1.0, (w_l - 1.0)[:, None])
        ly = (ys - y0)[:, :, None]                         # (R, Ty, 1)
        lx = (xs - x0)[:, :, None]                         # (R, Tx, 1)

        tot = int((heights * widths).sum())
        flat2 = flat.reshape(b * tot, c)
        gbase = (rois[:, 0].astype(jnp.int32) * tot
                 + off_l)[:, None, None]                  # (R, 1, 1)

        def take(yy, xx):
            # global row id in the (B*sumHW, C) buffer; a folded 1-D row
            # gather is the fastest XLA formulation on TPU (measured ~25%
            # over 2-axis advanced indexing at LVIS shapes)
            gidx = (gbase
                    + yy.astype(jnp.int32)[:, :, None] * w_int[:, None, None]
                    + xx.astype(jnp.int32)[:, None, :])
            ty, tx = gidx.shape[1], gidx.shape[2]
            return jnp.take(flat2, gidx.reshape(-1),
                            axis=0).reshape(r, ty, tx, c)

        v00 = take(y0, x0)
        v01 = take(y0, x1i)
        v10 = take(y1i, x0)
        v11 = take(y1i, x1i)
        lyb = ly[:, :, None, :]                            # (R, Ty, 1, 1)
        lxb = lx[:, None, :, :]                            # (R, 1, Tx, 1)
        taps = (v00 * (1 - lyb) * (1 - lxb) + v01 * (1 - lyb) * lxb
                + v10 * lyb * (1 - lxb) + v11 * lyb * lxb)
        taps = taps.reshape(r, out_h, s, out_w, s, c)
        return taps.mean(axis=(2, 4))

    def extract_single_level(self, feat: jnp.ndarray, rois: jnp.ndarray,
                             stride: int) -> jnp.ndarray:
        """RoIAlign every roi against ONE pyramid level (GRoIE's
        all-level extraction)."""
        ext = SingleRoIExtractor(self.output_size, (stride,),
                                 self.sampling_ratio, self.finest_scale)
        return ext._flat_gather(
            [feat], rois,
            lvls=jnp.zeros(rois.shape[0], jnp.int32))

    # --------------------------------------------------- per-level (pallas)
    def _per_level_pallas(self, feats: Sequence[jnp.ndarray],
                          rois: jnp.ndarray) -> jnp.ndarray:
        from iif_tpu.ops.pallas import roi_align_pallas

        num_levels = self.num_inputs
        lvls = map_roi_levels(rois, num_levels, self.finest_scale)
        outs = []
        for i in range(num_levels):
            outs.append(roi_align_pallas(
                feats[i], rois, self.output_size,
                spatial_scale=1.0 / self.featmap_strides[i],
                sampling_ratio=self.sampling_ratio, aligned=True))
        stacked = jnp.stack(outs, axis=0)
        onehot = jax.nn.one_hot(lvls, num_levels, axis=0,
                                dtype=stacked.dtype)
        return (stacked * onehot[:, :, None, None, None]).sum(axis=0)


class GenericRoIExtractor(nn.Module):
    """GRoIE (``generic_roi_extractor.py:10-90``, 'A novel Region of
    Interest Extraction Layer for Instance Segmentation'): RoIAlign every
    roi against ALL pyramid levels, run a shared pre module (the
    reference config's 5x5 ConvModule) on each, sum-aggregate, and
    refine with a shared attention post module.

    The reference's post module is mmcv GeneralizedAttention; here it is
    the embedded-gaussian non-local block (the same attention family,
    all-MXU on a 7x7/14x14 grid) — a documented substitution.
    """
    output_size: int = 7
    featmap_strides: Tuple[int, ...] = (4, 8, 16, 32)
    with_pre: bool = True
    with_post: bool = True
    aggregation: str = "sum"

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], rois: jnp.ndarray
                 ) -> jnp.ndarray:
        base = SingleRoIExtractor((self.output_size, self.output_size))
        pre = (nn.Conv(feats[0].shape[-1], (5, 5), name="pre_module")
               if self.with_pre else None)
        acc = None
        for i, s in enumerate(self.featmap_strides):
            rf = base.extract_single_level(feats[i], rois, s)
            if pre is not None:
                rf = nn.relu(pre(rf))
            acc = rf if acc is None else acc + rf
        if self.with_post:
            from iif_tpu.detection.necks import NonLocal2d

            acc = NonLocal2d(name="post_module")(acc)
        return acc
