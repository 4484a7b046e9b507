"""Multi-level grid anchor generation.

Rebuild of the reference's ``mmdet/core/anchor/anchor_generator.py:13-461``
(scales x ratios per stride, grid_anchors, valid_flags), restricted to the
retina/RPN convention the IIF configs use (``octave_base_scale`` not needed:
the MaskRCNN RPN uses scales=[8], ratios=[0.5,1,2], strides [4..64]).

Anchors are precomputed per feature-level as numpy constants at build time
(static shapes) — they enter the jitted step as closed-over constants, so no
per-step host work.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np


class AnchorGenerator:
    def __init__(
        self,
        strides: Sequence[int],
        ratios: Sequence[float] = (0.5, 1.0, 2.0),
        scales: Sequence[float] = (8.0,),
        base_sizes: Optional[Sequence[int]] = None,
        center_offset: float = 0.0,
    ):
        self.strides = [(s, s) if isinstance(s, int) else s for s in strides]
        self.ratios = np.asarray(ratios, np.float32)
        self.scales = np.asarray(scales, np.float32)
        self.base_sizes = list(base_sizes) if base_sizes is not None else [
            min(s) for s in self.strides]
        self.center_offset = center_offset
        self.base_anchors = [self._base_anchors(bs, stride)
                             for bs, stride in zip(self.base_sizes, self.strides)]

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def num_base_anchors(self) -> List[int]:
        return [a.shape[0] for a in self.base_anchors]

    def _base_anchors(self, base_size: int, stride: Tuple[int, int]
                      ) -> np.ndarray:
        w = h = float(base_size)
        cx = self.center_offset * stride[0]
        cy = self.center_offset * stride[1]
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        return np.stack([cx - 0.5 * ws, cy - 0.5 * hs,
                         cx + 0.5 * ws, cy + 0.5 * hs], axis=-1)

    def grid_anchors(self, featmap_sizes: Sequence[Tuple[int, int]]
                     ) -> List[np.ndarray]:
        """Per-level (H*W*A, 4) anchor arrays for the given feature sizes."""
        out = []
        for lvl, (fh, fw) in enumerate(featmap_sizes):
            sx, sy = self.strides[lvl]
            shift_x = np.arange(fw, dtype=np.float32) * sx
            shift_y = np.arange(fh, dtype=np.float32) * sy
            xx, yy = np.meshgrid(shift_x, shift_y)
            shifts = np.stack([xx.ravel(), yy.ravel(),
                               xx.ravel(), yy.ravel()], axis=-1)
            anchors = (self.base_anchors[lvl][None, :, :]
                       + shifts[:, None, :]).reshape(-1, 4)
            out.append(anchors.astype(np.float32))
        return out

    def valid_flags(self, featmap_sizes: Sequence[Tuple[int, int]],
                    pad_shape: Tuple[int, int]) -> List[np.ndarray]:
        """Anchor-center-inside-padded-image flags per level."""
        out = []
        for lvl, (fh, fw) in enumerate(featmap_sizes):
            sx, sy = self.strides[lvl]
            vx = np.arange(fw) * sx < pad_shape[1]
            vy = np.arange(fh) * sy < pad_shape[0]
            vv = (vy[:, None] & vx[None, :]).ravel()
            out.append(np.repeat(vv, self.num_base_anchors[lvl]))
        return out


class LegacyAnchorGenerator(AnchorGenerator):
    """MMDet V1.x anchor convention (reference
    ``core/anchor/anchor_generator.py:601-699``): anchor centers sit at
    ``center_offset * (size - 1)``, corners use ``size - 1`` half-extents,
    and base anchors are rounded to integers. Only needed when evaluating
    checkpoints trained with MMDetection 1.x (pair with
    ``legacy_delta2bbox``); V2.x+ models use ``AnchorGenerator``."""

    def __init__(self, *args, center_offset: float = 0.5, **kwargs):
        super().__init__(*args, center_offset=center_offset, **kwargs)

    def _base_anchors(self, base_size: int, stride: Tuple[int, int]
                      ) -> np.ndarray:
        w = h = float(base_size)
        cx = self.center_offset * (w - 1)
        cy = self.center_offset * (h - 1)
        h_ratios = np.sqrt(self.ratios)
        w_ratios = 1.0 / h_ratios
        ws = (w * w_ratios[:, None] * self.scales[None, :]).reshape(-1)
        hs = (h * h_ratios[:, None] * self.scales[None, :]).reshape(-1)
        return np.round(np.stack(
            [cx - 0.5 * (ws - 1), cy - 0.5 * (hs - 1),
             cx + 0.5 * (ws - 1), cy + 0.5 * (hs - 1)], axis=-1))
