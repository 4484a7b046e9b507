"""PointRend, static-shape.

Rebuild of the reference PointRend family
(``mmdet/models/detectors/point_rend.py``, roi head
``mmdet/models/roi_heads/point_rend_roi_head.py``, heads
``mask_heads/coarse_mask_head.py`` / ``mask_heads/mask_point_head.py``,
config ``configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py``):
MaskRCNN whose mask branch predicts a COARSE 7x7 FC mask from
P2-sampled 14x14 RoI features, then refines with a POINT HEAD — an MLP
over (P2 point features, coarse point logits) — at uncertainty-sampled
points: 196 train points (3x oversample, 0.75 importance) with a BCE
point loss, and a 5-step x2 subdivision at inference re-predicting the
784 most uncertain points each step (7 -> 224 final mask).

TPU formulation: point sampling is
:func:`iif_tpu.ops.deform.bilinear_sample_batched` (one flat gather),
the train-time uncertainty top-k is static (fixed point counts), and
the subdivision loop is a static unroll with ``.at[].set`` scatters.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    MaskRCNN,
)
from iif_tpu.ops.deform import bilinear_sample_batched, point_sample

COARSE_SIZE = 7
NUM_TRAIN_POINTS = 14 * 14
OVERSAMPLE_RATIO = 3
IMPORTANCE_RATIO = 0.75
SUBDIV_STEPS = 5
SUBDIV_POINTS = 28 * 28


class CoarseMaskHead(nn.Module):
    """``coarse_mask_head.py:26-101``: downsample conv (14->7) then
    2 FCs (1024) and an FC to C*7*7 logits (Constant 0.001 init)."""
    num_classes: int
    conv_out_channels: int = 256
    num_fcs: int = 2
    fc_out_channels: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(R, 14, 14, C) -> (R, 7, 7, num_classes) logits."""
        x = nn.relu(nn.Conv(self.conv_out_channels, (2, 2),
                            strides=(2, 2), padding="VALID",
                            name="downsample_conv")(x))
        r = x.shape[0]
        x = x.reshape(r, -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(
                self.fc_out_channels,
                kernel_init=nn.initializers.variance_scaling(
                    1.0, "fan_avg", "uniform"),
                name=f"fc{i}")(x))
        out = nn.Dense(self.num_classes * COARSE_SIZE * COARSE_SIZE,
                       kernel_init=nn.initializers.constant(0.001),
                       name="fc_logits")(x)
        return out.reshape(r, COARSE_SIZE, COARSE_SIZE, self.num_classes)


class MaskPointHead(nn.Module):
    """``mask_point_head.py:14-106``: 3 width-256 1x1 'fcs' over the
    concatenation of fine-grained point features and coarse point
    logits, the coarse logits re-appended after every layer."""
    num_classes: int
    num_fcs: int = 3
    fc_channels: int = 256

    @nn.compact
    def __call__(self, fine: jnp.ndarray,      # (R, P, C_feat)
                 coarse: jnp.ndarray           # (R, P, num_classes)
                 ) -> jnp.ndarray:             # (R, P, num_classes)
        x = jnp.concatenate([fine, coarse], axis=-1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(self.fc_channels, name=f"fc{i}")(x))
            x = jnp.concatenate([x, coarse], axis=-1)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.001),
                        name="fc_logits")(x)


class PointRend(MaskRCNN):
    """MaskRCNN + PointRend mask branch (``type='PointRend'``)."""

    def _with_fcn_mask_head(self) -> bool:
        return False            # the coarse + point heads replace it

    def setup(self):
        super().setup()
        self.coarse_mask_head = CoarseMaskHead(self.num_classes,
                                               name="coarse_mask_head")
        self.point_head = MaskPointHead(self.num_classes,
                                        name="point_head")

    def forward_coarse_mask(self, roi_feats):
        return self.coarse_mask_head(roi_feats)

    def forward_point_head(self, fine, coarse):
        return self.point_head(fine, coarse)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        out = super().__call__(images, train)
        c = 256
        d14 = jnp.zeros((1, 14, 14, c))
        coarse = self.coarse_mask_head(d14)
        self.point_head(jnp.zeros((1, 4, c)),
                        jnp.zeros((1, 4, self.num_classes)))
        return out


def _rel_to_img_points(rois5: jnp.ndarray,     # (R, 5)
                       rel: jnp.ndarray,       # (R, P, 2) in [0,1] (x, y)
                       stride: float) -> Tuple[jnp.ndarray, jnp.ndarray,
                                               jnp.ndarray]:
    """rel-roi points -> feature-map pixel coords at ``stride``
    (``point_rend_roi_head.py`` rel_roi_point_to_rel_img_point +
    grid_sample align_corners=False pixel mapping)."""
    x1, y1 = rois5[:, 1:2], rois5[:, 2:3]
    w = rois5[:, 3:4] - x1
    h = rois5[:, 4:5] - y1
    xs = (x1 + rel[..., 0] * w) / stride - 0.5
    ys = (y1 + rel[..., 1] * h) / stride - 0.5
    return rois5[:, 0].astype(jnp.int32), ys, xs


def sample_fine_grained(p2: jnp.ndarray,       # (B, H/4, W/4, C)
                        rois5: jnp.ndarray,    # (R, 5)
                        rel: jnp.ndarray       # (R, P, 2)
                        ) -> jnp.ndarray:      # (R, P, C)
    b_idx, ys, xs = _rel_to_img_points(rois5, rel, 4.0)
    bi = jnp.broadcast_to(b_idx[:, None], rel.shape[:2])
    return bilinear_sample_batched(p2, bi, ys, xs)


def _sample_grid(grid: jnp.ndarray,            # (R, h, w) or (R, h, w, C)
                 rel: jnp.ndarray              # (R, P, 2) [0,1]
                 ) -> jnp.ndarray:
    """point_sample on a per-roi grid (align_corners=False)."""
    squeeze = grid.ndim == 3
    if squeeze:
        grid = grid[..., None]
    out = point_sample(grid, rel)
    return out[..., 0] if squeeze else out


def get_uncertain_point_coords_train(
    key: jax.Array,
    coarse_pred: jnp.ndarray,     # (R, 7, 7, C) logits
    labels: jnp.ndarray,          # (R,)
    num_points: int = NUM_TRAIN_POINTS,
    oversample_ratio: int = OVERSAMPLE_RATIO,
    importance_ratio: float = IMPORTANCE_RATIO,
) -> jnp.ndarray:
    """``mask_point_head.py:213-267``: sample 3x random points, keep the
    0.75 fraction with highest uncertainty (-|sampled gt-class logit|),
    fill the rest with fresh random points. Returns (R, P, 2)."""
    r = coarse_pred.shape[0]
    n_samp = num_points * oversample_ratio
    k1, k2 = jax.random.split(key)
    coords = jax.random.uniform(k1, (r, n_samp, 2))
    logits = _sample_grid(coarse_pred, coords)           # (R, n, C)
    cls = jnp.clip(labels, 0, coarse_pred.shape[-1] - 1)
    sel = jnp.take_along_axis(
        logits, cls[:, None, None].repeat(n_samp, 1), axis=2)[..., 0]
    unc = -jnp.abs(sel)
    n_unc = int(importance_ratio * num_points)
    idx = jax.lax.top_k(unc, n_unc)[1]                   # (R, n_unc)
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    n_rand = num_points - n_unc
    rand = jax.random.uniform(k2, (r, n_rand, 2))
    return jnp.concatenate([picked, rand], axis=1)


def point_rend_mask_loss(
    model: PointRend,
    variables: Dict[str, Any],
    feats,                        # FPN levels
    pos_rois5: jnp.ndarray,       # (M, 5)
    pos_labels: jnp.ndarray,      # (M,)
    pos_gt: jnp.ndarray,          # (M,)
    pos_w: jnp.ndarray,           # (M,)
    gt_masks: jnp.ndarray,        # (B, G, Hc, Wc)
    key: jax.Array,
    gt_stride: int = 1,
) -> Dict[str, jnp.ndarray]:
    """The PointRend train mask branch
    (``point_rend_roi_head.py:30-103``): coarse 7x7 BCE + point BCE."""
    from iif_tpu.detection.mask_head import mask_head_loss, mask_targets
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor

    extractor = SingleRoIExtractor((14, 14), featmap_strides=(4,))
    mfeats = extractor([feats[0]], pos_rois5)
    coarse = model.apply(variables, mfeats,
                         method=PointRend.forward_coarse_mask)
    mask_tgt7 = mask_targets(pos_rois5, pos_gt, gt_masks, COARSE_SIZE,
                             gt_stride=gt_stride)
    cls = jnp.clip(pos_labels, 0, model.num_classes - 1)
    coarse_sel = jnp.take_along_axis(
        coarse, cls[:, None, None, None], axis=-1)[..., 0]
    loss_mask = mask_head_loss(coarse_sel, mask_tgt7, pos_labels, pos_w)

    rel = get_uncertain_point_coords_train(
        key, jax.lax.stop_gradient(coarse), pos_labels)
    fine = sample_fine_grained(feats[0], pos_rois5, rel)
    coarse_pts = _sample_grid(coarse, rel)               # (M, P, C)
    point_logits = model.apply(variables, fine, coarse_pts,
                               method=PointRend.forward_point_head)
    sel = jnp.take_along_axis(
        point_logits, cls[:, None, None].repeat(rel.shape[1], 1),
        axis=2)[..., 0]                                  # (M, P)

    # point targets: bilinear sample of the matched gt mask at the
    # absolute point coords (mask_point_head.py get_targets)
    b, g, hc, wc = gt_masks.shape
    gsel = gt_masks.reshape(b * g, hc, wc)[
        pos_rois5[:, 0].astype(jnp.int32) * g + pos_gt]
    b_idx, ys, xs = _rel_to_img_points(pos_rois5, rel, float(gt_stride))
    # per-roi grid sample of its own mask
    flat = gsel[..., None].astype(jnp.float32)
    tgt = bilinear_sample_batched(
        flat, jnp.broadcast_to(jnp.arange(flat.shape[0])[:, None],
                               rel.shape[:2]), ys, xs)[..., 0]
    bce = (jnp.maximum(sel, 0) - sel * tgt
           + jnp.log1p(jnp.exp(-jnp.abs(sel))))
    loss_point = (bce.mean(1) * pos_w).sum() / jnp.maximum(pos_w.sum(),
                                                           1.0)
    return {"loss_mask": loss_mask, "loss_point": loss_point}


def point_rend_refine_masks(
    model: PointRend,
    variables: Dict[str, Any],
    feats,
    det_rois5: jnp.ndarray,       # (K, 5)
    labels: jnp.ndarray,          # (K,)
    subdivision_steps: int = SUBDIV_STEPS,
    subdivision_points: int = SUBDIV_POINTS,
) -> jnp.ndarray:
    """Inference subdivision (``point_rend_roi_head.py:104-154``):
    upsample x2 per step, re-predict the most uncertain points.
    Returns (K, S, S) gt-class logits, S = 7 * 2^steps."""
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor

    extractor = SingleRoIExtractor((14, 14), featmap_strides=(4,))
    mfeats = extractor([feats[0]], det_rois5)
    coarse = model.apply(variables, mfeats,
                         method=PointRend.forward_coarse_mask)
    cls = jnp.clip(labels, 0, model.num_classes - 1)
    mask = jnp.take_along_axis(
        coarse, cls[:, None, None, None], axis=-1)[..., 0]   # (K, 7, 7)
    k = mask.shape[0]
    for _ in range(subdivision_steps):
        s = mask.shape[-1] * 2
        mask = jax.image.resize(mask, (k, s, s), "bilinear")
        n_pts = min(subdivision_points, s * s)
        unc = -jnp.abs(mask).reshape(k, s * s)
        idx = jax.lax.top_k(unc, n_pts)[1]                   # (K, n)
        xs = (idx % s).astype(jnp.float32) / s + 0.5 / s
        ys = (idx // s).astype(jnp.float32) / s + 0.5 / s
        rel = jnp.stack([xs, ys], -1)                        # (K, n, 2)
        fine = sample_fine_grained(feats[0], det_rois5, rel)
        coarse_pts = _sample_grid(coarse, rel)
        point_logits = model.apply(variables, fine, coarse_pts,
                                   method=PointRend.forward_point_head)
        sel = jnp.take_along_axis(
            point_logits, cls[:, None, None].repeat(n_pts, 1),
            axis=2)[..., 0]                                  # (K, n)
        flat = mask.reshape(k, s * s)
        flat = jax.vmap(lambda m, i, v: m.at[i].set(v))(flat, idx, sel)
        mask = flat.reshape(k, s, s)
    return mask
