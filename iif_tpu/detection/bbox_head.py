"""Shared2FC bbox head with the custom-loss (IIF) protocol.

Rebuild of ``mmdet/models/roi_heads/bbox_heads/bbox_head.py`` +
``convfc_bbox_head.py`` (Shared2FCBBoxHead): flatten RoI features, two
shared 1024-d FCs, then a (C+1)-way classifier (plain Dense or
NormedLinear cosine, selected like the reference's ``cls_predictor_cfg``)
and a C*4 class-specific box regressor.

Target assembly (``get_targets``/``_get_target_single``,
``bbox_head.py:122-254``) and the RCNN assign/sample stage
(``standard_roi_head.py:84-98``) are fused into one vmap-able
``bbox_targets`` with fixed 512-RoI slates — the reference's
dynamic-shape per-image python loop disappears.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iif_tpu.detection.losses import smooth_l1_loss
from iif_tpu.models.layers import NormedLinear
from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms
from iif_tpu.ops.sampler import random_sample_pos_neg

BBOX_TARGET_MEANS = (0.0, 0.0, 0.0, 0.0)
BBOX_TARGET_STDS = (0.1, 0.1, 0.2, 0.2)


class Shared2FCBBoxHead(nn.Module):
    num_classes: int
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False
    cls_predictor: str = "linear"      # 'linear' | 'normed'
    cls_temperature: float = 8.0       # NormedLinear temperature
    # fc_cls weight init: ('normal', std) or ('constant', val) — the IIF
    # recipe trains with Constant(0.001), bias 0
    # (experiments/iif/iif_r50_4x4_1x/iif_r50_4x4_1x.py:58-62)
    cls_init: tuple = ("normal", 0.01)

    # static IIF multipliers for the 'iif_normed' predictor
    iif_weights: tuple = ()

    def setup(self):
        self.shared_fc1 = nn.Dense(self.fc_out_channels, name="shared_fc1")
        self.shared_fc2 = nn.Dense(self.fc_out_channels, name="shared_fc2")
        kind, val = self.cls_init
        if kind == "constant":
            cls_kernel_init = nn.initializers.constant(val)
        else:
            cls_kernel_init = nn.initializers.normal(val)
        if self.cls_predictor == "normed":
            self.fc_cls = NormedLinear(self.num_classes + 1,
                                       temperature=self.cls_temperature,
                                       name="fc_cls")
        elif self.cls_predictor == "iif_normed":
            from iif_tpu.models.layers import IIFNormedLinear

            self.fc_cls = IIFNormedLinear(
                self.num_classes + 1, iif_weights=tuple(self.iif_weights),
                temperature=self.cls_temperature, name="fc_cls")
        else:
            self.fc_cls = nn.Dense(
                self.num_classes + 1,
                kernel_init=cls_kernel_init, name="fc_cls")
        reg_dim = 4 if self.reg_class_agnostic else self.num_classes * 4
        self.fc_reg = nn.Dense(reg_dim,
                               kernel_init=nn.initializers.normal(0.001),
                               name="fc_reg")

    def __call__(self, roi_feats: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """roi_feats (R, 7, 7, C) -> (cls_score (R, C+1),
        bbox_pred (R, C*4 or 4), embedding (R, 1024))."""
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(self.shared_fc1(x))
        x = nn.relu(self.shared_fc2(x))
        cls_score = self.fc_cls(x)
        bbox_pred = self.fc_reg(x)
        return cls_score, bbox_pred, x

    def cls_only(self, embedding: jnp.ndarray) -> jnp.ndarray:
        """Classifier on raw 1024-d embeddings (FASA virtual features go
        through ``fc_cls`` only, ``fasa_bbox_head.py:283-287``)."""
        return self.fc_cls(embedding)


class BBoxTargets(NamedTuple):
    rois: jnp.ndarray        # (B, R, 4) sampled proposals
    labels: jnp.ndarray      # (B, R) class or num_classes for bg
    label_weights: jnp.ndarray  # (B, R)
    bbox_targets: jnp.ndarray   # (B, R, 4)
    bbox_weights: jnp.ndarray   # (B, R)  1 for positives
    pos_gt_inds: jnp.ndarray    # (B, R) matched gt index (positives)


def bbox_targets(
    key: jax.Array,
    proposals: jnp.ndarray,      # (B, P, 4)
    proposal_valid: jnp.ndarray,  # (B, P)
    gt_boxes: jnp.ndarray,       # (B, G, 4)
    gt_labels: jnp.ndarray,      # (B, G)
    gt_valid: jnp.ndarray,       # (B, G)
    num_classes: int,
    num_samples: int = 512,
    pos_fraction: float = 0.25,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.5,
    min_pos_iou: float = 0.5,
    add_gt_as_proposals: bool = True,
) -> BBoxTargets:
    b, p, _ = proposals.shape
    g = gt_boxes.shape[1]
    keys = jax.random.split(key, b)

    def _one(k, props, pvalid, gtb, gtl, gtv):
        if add_gt_as_proposals:
            props = jnp.concatenate([gtb, props], axis=0)
            pvalid = jnp.concatenate([gtv, pvalid], axis=0)
        assigned, _ = max_iou_assign(
            props, gtb, gtv, pos_iou_thr, neg_iou_thr, min_pos_iou,
            match_low_quality=False)
        assigned = jnp.where(pvalid, assigned, -1)
        inds, is_pos, valid = random_sample_pos_neg(
            k, assigned, num=num_samples, pos_fraction=pos_fraction)
        rois = props[inds]
        gt_idx = jnp.clip(assigned[inds] - 1, 0, g - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], num_classes)
        lw = valid.astype(jnp.float32)
        tgt = bbox2delta(rois, gtb[gt_idx], BBOX_TARGET_MEANS,
                         BBOX_TARGET_STDS)
        bw = (is_pos & valid).astype(jnp.float32)
        return rois, labels, lw, tgt, bw, gt_idx

    rois, labels, lw, tgt, bw, gi = jax.vmap(_one)(
        keys, proposals, proposal_valid, gt_boxes, gt_labels, gt_valid)
    return BBoxTargets(rois, labels, lw, tgt, bw, gi)


def bbox_head_loss(
    cls_score: jnp.ndarray,     # (B*R, C+1)
    bbox_pred: jnp.ndarray,     # (B*R, C*4) or (B*R, 4)
    targets: BBoxTargets,
    loss_cls,
    num_classes: int,
    reg_class_agnostic: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """loss_cls averaged over valid samples, L1 bbox loss over positives
    normalized by total valid samples (``bbox_head.py:256-314``)."""
    labels = targets.labels.reshape(-1)
    lw = targets.label_weights.reshape(-1)
    bw = targets.bbox_weights.reshape(-1)
    tgt = targets.bbox_targets.reshape(-1, 4)

    l_cls = loss_cls(cls_score, labels, weight=lw, avg_factor=lw.sum())

    if reg_class_agnostic:
        pred = bbox_pred
    else:
        pred = bbox_pred.reshape(-1, num_classes, 4)
        cls_idx = jnp.clip(labels, 0, num_classes - 1)
        pred = jnp.take_along_axis(
            pred, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    l1 = jnp.abs(pred - tgt).sum(-1)
    l_bbox = (l1 * bw).sum() / jnp.maximum(lw.sum(), 1.0)
    return l_cls, l_bbox


def bbox_head_get_bboxes(
    rois: jnp.ndarray,          # (R, 4)
    cls_score: jnp.ndarray,     # (R, C+1)
    bbox_pred: jnp.ndarray,     # (R, C*4)
    img_shape: Tuple[int, int],
    loss_cls,
    scale_factor: Optional[jnp.ndarray] = None,
    score_thr: float = 0.05,
    nms_iou: float = 0.5,
    max_per_img: int = 100,
    num_classes: Optional[int] = None,
    nms_kind: str = "nms",
):
    """Decode + custom activation + multiclass NMS
    (``bbox_head.py:315-377``). ``nms_kind='fast'`` swaps in YOLACT fast
    NMS (reference ``bbox_nms.py:98-171``). Returns fixed-shape
    detections."""
    if hasattr(loss_cls, "get_activation") and getattr(
            loss_cls, "custom_activation", False):
        scores = loss_cls.get_activation(cls_score)
    else:
        scores = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    boxes = delta2bbox(rois, bbox_pred, BBOX_TARGET_MEANS, BBOX_TARGET_STDS,
                       max_shape=img_shape)
    if scale_factor is not None:
        boxes = boxes / jnp.tile(scale_factor, boxes.shape[-1] // 4)
    if nms_kind == "fast":
        from iif_tpu.ops.nms import fast_nms

        return fast_nms(boxes, scores, score_thr, nms_iou,
                        max_per_img=max_per_img)
    return multiclass_nms(boxes, scores, score_thr, nms_iou, max_per_img)
