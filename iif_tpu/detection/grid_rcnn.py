"""Grid R-CNN (Plus), static-shape.

Rebuild of the reference Grid R-CNN family
(``mmdet/models/detectors/grid_rcnn.py``, roi head
``mmdet/models/roi_heads/grid_roi_head.py``, grid head
``mmdet/models/roi_heads/mask_heads/grid_head.py``, config
``configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py``): the box
regression of Faster R-CNN is replaced at inference by a 9-point GRID
HEAD — 8 convs (GN36) on jittered positive RoI features, first/second
order feature fusion between neighboring grid points (depthwise-5x5 +
1x1 transitions), two grouped deconvs to a 56-px heatmap supervised by
r=1 positive circles at the gt grid points (sigmoid CE x15 on both the
fused and unfused maps, Grid R-CNN Plus quarter sub-regions), and
test-time boundary voting of the heatmap argmaxes.

Grouped transpose convs lower to ``lax.conv_general_dilated`` with
``lhs_dilation`` (XLA's native deconv form) + feature_group_count.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.detector import MaskRCNN

GRID_POINTS = 9
GRID_SIZE = 3
POINT_FEAT = 64
WHOLE_MAP = 56          # roi_feat_size 14 * 4
HALF_MAP = 28
POS_RADIUS = 1


def calc_sub_regions(grid_points: int = GRID_POINTS,
                     grid_size: int = GRID_SIZE,
                     whole_map: int = WHOLE_MAP):
    """``grid_head.py:193-223`` (Grid R-CNN Plus quarter windows)."""
    half = whole_map // 4 * 2
    subs = []
    for i in range(grid_points):
        x_idx, y_idx = i // grid_size, i % grid_size
        if x_idx == 0:
            sx = 0
        elif x_idx == grid_size - 1:
            sx = half
        else:
            sx = max(int((x_idx / (grid_size - 1) - 0.25) * whole_map), 0)
        if y_idx == 0:
            sy = 0
        elif y_idx == grid_size - 1:
            sy = half
        else:
            sy = max(int((y_idx / (grid_size - 1) - 0.25) * whole_map), 0)
        subs.append((sx, sy, sx + half, sy + half))
    return subs


SUB_REGIONS = calc_sub_regions()
NEIGHBORS = []
for _i in range(GRID_SIZE):
    for _j in range(GRID_SIZE):
        _n = []
        if _i > 0:
            _n.append((_i - 1) * GRID_SIZE + _j)
        if _j > 0:
            _n.append(_i * GRID_SIZE + _j - 1)
        if _j < GRID_SIZE - 1:
            _n.append(_i * GRID_SIZE + _j + 1)
        if _i < GRID_SIZE - 1:
            _n.append((_i + 1) * GRID_SIZE + _j)
        NEIGHBORS.append(tuple(_n))


def grouped_deconv(x: jnp.ndarray, w: jnp.ndarray, groups: int,
                   bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Transpose conv k4 s2 p1 (doubles H/W) as an lhs-dilated conv."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if bias is not None:
        out = out + bias
    return out


class GridHead(nn.Module):
    """``grid_head.py:15-192``."""
    num_convs: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c_all = POINT_FEAT * GRID_POINTS
        for i in range(self.num_convs):
            stride = 2 if i == 0 else 1
            x = nn.relu(nn.GroupNorm(num_groups=36, name=f"gn{i}")(
                nn.Conv(c_all, (3, 3), strides=(stride, stride),
                        padding=1, name=f"conv{i}")(x)))

        def trans(inp, name):
            h = nn.Conv(POINT_FEAT, (5, 5), padding=2,
                        feature_group_count=POINT_FEAT,
                        name=f"{name}_dw")(inp)
            return nn.Conv(POINT_FEAT, (1, 1), name=f"{name}_pw")(h)

        c = POINT_FEAT
        slices = [x[..., i * c:(i + 1) * c] for i in range(GRID_POINTS)]
        x_fo = []
        for i, pts in enumerate(NEIGHBORS):
            acc = slices[i]
            for j, p in enumerate(pts):
                acc = acc + trans(slices[p], f"fo_{i}_{j}")
            x_fo.append(acc)
        x_so = []
        for i, pts in enumerate(NEIGHBORS):
            acc = slices[i]
            for j, p in enumerate(pts):
                acc = acc + trans(x_fo[p], f"so_{i}_{j}")
            x_so.append(acc)

        w1 = self.param("deconv1_kernel",
                        nn.initializers.normal(0.001),
                        (4, 4, POINT_FEAT, c_all), jnp.float32)
        b1 = self.param("deconv1_bias", nn.initializers.zeros,
                        (c_all,), jnp.float32)
        w2 = self.param("deconv2_kernel",
                        nn.initializers.normal(0.001),
                        (4, 4, POINT_FEAT, GRID_POINTS), jnp.float32)
        b2 = self.param(
            "deconv2_bias",
            nn.initializers.constant(-float(np.log(0.99 / 0.01))),
            (GRID_POINTS,), jnp.float32)
        gn1 = nn.GroupNorm(num_groups=GRID_POINTS, name="deconv_gn")

        def head(feat):
            h = grouped_deconv(feat, w1, GRID_POINTS, b1)
            h = nn.relu(gn1(h))
            return grouped_deconv(h, w2, GRID_POINTS, b2)   # (R,28,28,9)

        fused = head(jnp.concatenate(x_so, -1))
        unfused = head(x) if train else fused
        return fused, unfused


class GridRCNN(MaskRCNN):
    """``type='GridRCNN'``: box-only two-stage + grid head."""
    with_grid: bool = True
    with_mask: bool = False

    def setup(self):
        super().setup()
        self.grid_head = GridHead(name="grid_head")

    def forward_grid(self, roi_feats, train: bool = False):
        return self.grid_head(roi_feats, train=train)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        out = super().__call__(images, train)
        self.grid_head(jnp.zeros((1, 14, 14, 256)), train=True)
        return out


def grid_targets(pos_rois5: jnp.ndarray,     # (M, 5) jittered positives
                 gt_boxes: jnp.ndarray,      # (M, 4) matched gts
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``grid_head.py:224-291``: r=1 circles at the gt grid points in
    the 2x-expanded roi frame, cropped to the per-point quarter windows.
    Returns (targets (M, 28, 28, 9), valid (M,))."""
    x1 = pos_rois5[:, 1] - (pos_rois5[:, 3] - pos_rois5[:, 1]) / 2
    y1 = pos_rois5[:, 2] - (pos_rois5[:, 4] - pos_rois5[:, 2]) / 2
    x2 = pos_rois5[:, 3] + (pos_rois5[:, 3] - pos_rois5[:, 1]) / 2
    y2 = pos_rois5[:, 4] + (pos_rois5[:, 4] - pos_rois5[:, 2]) / 2
    ws = jnp.maximum(x2 - x1, 1e-6)
    hs = jnp.maximum(y2 - y1, 1e-6)
    ok = (ws > GRID_SIZE) & (hs > GRID_SIZE)

    maps = []
    for j in range(GRID_POINTS):
        fx = 1 - (j // GRID_SIZE) / (GRID_SIZE - 1)
        fy = 1 - (j % GRID_SIZE) / (GRID_SIZE - 1)
        gx = fx * gt_boxes[:, 0] + (1 - fx) * gt_boxes[:, 2]
        gy = fy * gt_boxes[:, 1] + (1 - fy) * gt_boxes[:, 3]
        cx = ((gx - x1) / ws * WHOLE_MAP).astype(jnp.int32)
        cy = ((gy - y1) / hs * WHOLE_MAP).astype(jnp.int32)
        sx, sy, _, _ = SUB_REGIONS[j]
        xs = jnp.arange(HALF_MAP)[None, None, :] + sx     # whole coords
        ys = jnp.arange(HALF_MAP)[None, :, None] + sy
        circ = ((xs - cx[:, None, None]) ** 2
                + (ys - cy[:, None, None]) ** 2) <= POS_RADIUS ** 2
        maps.append(circ)
    t = jnp.stack(maps, -1).astype(jnp.float32)           # (M,28,28,9)
    return t * ok[:, None, None, None].astype(jnp.float32), ok


def grid_refine_boxes(fused: jnp.ndarray,     # (K, 28, 28, 9) logits
                      det_boxes: jnp.ndarray,  # (K, 4)
                      img_hw: Tuple[int, int]) -> jnp.ndarray:
    """``grid_head.py:298-380`` get_bboxes: per-point argmax in the
    quarter window mapped back to the whole 56-map, boundary-point
    score-weighted voting."""
    k = fused.shape[0]
    p = jax.nn.sigmoid(fused.astype(jnp.float32))
    flat = p.transpose(0, 3, 1, 2).reshape(k, GRID_POINTS, -1)
    scores = flat.max(-1)                                  # (K, 9)
    pos = flat.argmax(-1)
    xs = (pos % HALF_MAP).astype(jnp.float32)
    ys = (pos // HALF_MAP).astype(jnp.float32)
    sub = jnp.asarray(SUB_REGIONS, jnp.float32)            # (9, 4)
    xs = xs + sub[None, :, 0]
    ys = ys + sub[None, :, 1]

    widths = (det_boxes[:, 2] - det_boxes[:, 0])[:, None]
    heights = (det_boxes[:, 3] - det_boxes[:, 1])[:, None]
    ex1 = det_boxes[:, 0][:, None] - widths / 2
    ey1 = det_boxes[:, 1][:, None] - heights / 2
    abs_xs = (xs + 0.5) / HALF_MAP * widths + ex1
    abs_ys = (ys + 0.5) / HALF_MAP * heights + ey1

    x1_i = [i for i in range(GRID_SIZE)]
    y1_i = [i * GRID_SIZE for i in range(GRID_SIZE)]
    x2_i = [GRID_POINTS - GRID_SIZE + i for i in range(GRID_SIZE)]
    y2_i = [(i + 1) * GRID_SIZE - 1 for i in range(GRID_SIZE)]

    def vote(vals, idx):
        s = scores[:, idx]
        return (vals[:, idx] * s).sum(1) / jnp.maximum(s.sum(1), 1e-6)

    bx1 = jnp.clip(vote(abs_xs, x1_i), 0, img_hw[1])
    by1 = jnp.clip(vote(abs_ys, y1_i), 0, img_hw[0])
    bx2 = jnp.clip(vote(abs_xs, x2_i), 0, img_hw[1])
    by2 = jnp.clip(vote(abs_ys, y2_i), 0, img_hw[0])
    return jnp.stack([bx1, by1, bx2, by2], -1)


def random_jitter(key: jax.Array, rois5: jnp.ndarray,
                  img_hw: Tuple[int, int],
                  amplitude: float = 0.15) -> jnp.ndarray:
    """``grid_roi_head.py:28-60`` _random_jitter on batch-indexed rois
    (new box must keep w/h >= 1 after the offset — here clipped)."""
    off = jax.random.uniform(key, (rois5.shape[0], 4),
                             minval=-amplitude, maxval=amplitude)
    w = rois5[:, 3] - rois5[:, 1]
    h = rois5[:, 4] - rois5[:, 2]
    scale = jnp.stack([w, h, w, h], -1)
    new = rois5[:, 1:] + off * scale
    new = jnp.stack([
        jnp.clip(new[:, 0], 0, img_hw[1]),
        jnp.clip(new[:, 1], 0, img_hw[0]),
        jnp.clip(jnp.maximum(new[:, 2], new[:, 0] + 1.0), 0, img_hw[1]),
        jnp.clip(jnp.maximum(new[:, 3], new[:, 1] + 1.0), 0, img_hw[0])],
        -1)
    return jnp.concatenate([rois5[:, :1], new], axis=1)


def grid_loss(model, variables, feats, pos_rois5, pos_gt_boxes, pos_w,
              key, img_hw) -> jnp.ndarray:
    """The grid branch of ``grid_roi_head.py`` _bbox_forward_train:
    jitter positives, 14x14 features, sigmoid CE x15 on fused AND
    unfused heatmaps, mean over elements of real positives."""
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor

    rois = random_jitter(key, pos_rois5, img_hw)
    extractor = SingleRoIExtractor((14, 14))
    gfeats = extractor(feats[:4], rois)
    fused, unfused = model.apply(variables, gfeats, True,
                                 method=GridRCNN.forward_grid)
    tgt, ok = grid_targets(rois, pos_gt_boxes)
    w = (pos_w * ok)[:, None, None, None]

    def bce(logits):
        l32 = logits.astype(jnp.float32)
        e = (jnp.maximum(l32, 0) - l32 * tgt
             + jnp.log1p(jnp.exp(-jnp.abs(l32))))
        return (e * w).sum() / jnp.maximum(
            w.sum() * HALF_MAP * HALF_MAP * GRID_POINTS, 1.0)

    return 15.0 * (bce(fused) + bce(unfused))
