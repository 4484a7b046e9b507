"""Multi-level RoI feature extraction.

Rebuild of ``mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py``:
FPN level assignment ``lvl = floor(log2(sqrt(area)/56))`` clipped to
[0, L-1] (`:36-55`), then RoIAlign on the assigned level.

TPU-first: instead of the reference's per-level gather/scatter with the
empty-level graph-completion hack (`:86-114`), we run RoIAlign on *every*
level for every RoI and select with a one-hot mask — levels x RoIs is a
dense, static computation that XLA pipelines cleanly; for L=4 the extra
FLOPs are tiny next to the conv towers and there is no dynamic shape
anywhere.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from iif_tpu.ops.roi_align import roi_align


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
        # Pallas TPU kernel (forward-only; 1.4x the XLA gather path at
        # HIGHEST matmul precision) — inference path option.
        self.use_pallas = use_pallas

    @property
    def num_inputs(self) -> int:
        return len(self.featmap_strides)

    def __call__(self, feats: Sequence[jnp.ndarray], rois: jnp.ndarray
                 ) -> jnp.ndarray:
        """feats: L x (B, H_l, W_l, C); rois (R, 5) = (batch_idx, x1..y2).
        Returns (R, oh, ow, C)."""
        num_levels = self.num_inputs
        lvls = map_roi_levels(rois, num_levels, self.finest_scale)
        if self.use_pallas:
            from iif_tpu.ops.pallas import roi_align_pallas as _ra
        else:
            _ra = roi_align
        outs = []
        for i in range(num_levels):
            outs.append(_ra(
                feats[i], rois, self.output_size,
                spatial_scale=1.0 / self.featmap_strides[i],
                sampling_ratio=self.sampling_ratio, aligned=True))
        stacked = jnp.stack(outs, axis=0)            # (L, R, oh, ow, C)
        onehot = jax.nn.one_hot(lvls, num_levels, axis=0,
                                dtype=stacked.dtype)  # (L, R)
        return (stacked * onehot[:, :, None, None, None]).sum(axis=0)
