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
    # (experiments/iif/iif_r50_4x4_1x/iif_r50_4x4_1x.py:58-62). An
    # optional 3rd element sets the bias init (the sigmoid-CE baselines
    # of configs/activations use bias=-6.5, r50_4x4_1x.py:9).
    cls_init: tuple = ("normal", 0.01)

    # static IIF multipliers for the 'iif_normed' predictor
    iif_weights: tuple = ()

    # classifier output channels; 0 -> num_classes + 1. SeesawLoss's
    # custom-cls-channels protocol needs C + 2 (class logits + a 2-way
    # objectness pair, reference seesaw_loss.py:145-154)
    cls_channels: int = 0
    # ConvFCBBoxHead generalization (``convfc_bbox_head.py``): optional
    # shared 3x3 convs before the fcs — the gn/gn+ws recipes use the
    # '4conv1fc' head (num_shared_convs=4, num_shared_fcs=1, GN(32))
    num_shared_convs: int = 0
    num_shared_fcs: int = 2
    norm: str = ""                     # '' | 'gn' on the shared convs
    conv_ws: bool = False

    def setup(self):
        if self.num_shared_convs:
            from iif_tpu.models.resnet import make_conv

            conv_cls_ = make_conv(self.conv_ws)
            self.shared_convs = [conv_cls_(
                256, (3, 3), padding=1, use_bias=not self.norm,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "normal"),
                name=f"shared_conv{i}")
                for i in range(self.num_shared_convs)]
            if self.norm == "gn":
                self.shared_gns = [
                    nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                 name=f"shared_gn{i}")
                    for i in range(self.num_shared_convs)]
        self.shared_fc1 = nn.Dense(self.fc_out_channels, name="shared_fc1")
        if self.num_shared_fcs > 1:
            self.shared_fc2 = nn.Dense(self.fc_out_channels,
                                       name="shared_fc2")
        kind, val = self.cls_init[:2]
        if kind == "constant":
            cls_kernel_init = nn.initializers.constant(val)
        else:
            cls_kernel_init = nn.initializers.normal(val)
        cls_bias_init = (nn.initializers.constant(self.cls_init[2])
                         if len(self.cls_init) > 2
                         else nn.initializers.zeros)
        out_ch = self.cls_channels or self.num_classes + 1
        if self.cls_predictor == "normed":
            self.fc_cls = NormedLinear(out_ch,
                                       temperature=self.cls_temperature,
                                       name="fc_cls")
        elif self.cls_predictor == "iif_normed":
            from iif_tpu.models.layers import IIFNormedLinear

            self.fc_cls = IIFNormedLinear(
                self.num_classes + 1, iif_weights=tuple(self.iif_weights),
                temperature=self.cls_temperature, name="fc_cls")
        else:
            self.fc_cls = nn.Dense(
                out_ch, kernel_init=cls_kernel_init,
                bias_init=cls_bias_init, name="fc_cls")
        reg_dim = 4 if self.reg_class_agnostic else self.num_classes * 4
        self.fc_reg = nn.Dense(reg_dim,
                               kernel_init=nn.initializers.normal(0.001),
                               name="fc_reg")

    def __call__(self, roi_feats: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """roi_feats (R, 7, 7, C) -> (cls_score (R, C+1),
        bbox_pred (R, C*4 or 4), embedding (R, 1024))."""
        x = roi_feats
        if self.num_shared_convs:
            for i, conv in enumerate(self.shared_convs):
                x = conv(x)
                if self.norm == "gn":
                    x = self.shared_gns[i](x)
                x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(self.shared_fc1(x))
        if self.num_shared_fcs > 1:
            x = nn.relu(self.shared_fc2(x))
        cls_score = self.fc_cls(x)
        bbox_pred = self.fc_reg(x)
        return cls_score, bbox_pred, x

    def cls_only(self, embedding: jnp.ndarray) -> jnp.ndarray:
        """Classifier on raw 1024-d embeddings (FASA virtual features go
        through ``fc_cls`` only, ``fasa_bbox_head.py:283-287``)."""
        return self.fc_cls(embedding)


class DoubleConvFCBBoxHead(nn.Module):
    """Double-Head R-CNN bbox head (``double_bbox_head.py:77-180`` +
    ``double_roi_head.py:7-34``): a conv branch (BasicResBlock ->
    ``num_convs`` bottlenecks -> global avgpool -> ``fc_reg``) runs on RoI
    features extracted at ``reg_roi_scale_factor``x, and an fc branch
    (``num_fcs`` FCs -> ``fc_cls``) on the normal-scale features.
    Reference config: ``configs/double_heads/dh_faster_rcnn_r50_fpn``
    (num_convs=4, num_fcs=2, both losses weighted 2.0)."""

    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 1024
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False

    @nn.compact
    def __call__(self, x_cls: jnp.ndarray, x_reg: jnp.ndarray,
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, name=name)

        co = self.conv_out_channels
        # BasicResBlock (double_bbox_head.py:11-74): 3x3 (in->in) + 1x1
        # (in->out), identity 1x1 projection, add, relu
        y = nn.relu(bn("rb_bn1")(nn.Conv(
            x_reg.shape[-1], (3, 3), use_bias=False, name="rb_conv1")(
            x_reg)))
        y = bn("rb_bn2")(nn.Conv(co, (1, 1), use_bias=False,
                                 name="rb_conv2")(y))
        idn = bn("rb_bn_id")(nn.Conv(co, (1, 1), name="rb_conv_id")(x_reg))
        x_conv = nn.relu(y + idn)
        # num_convs ResNet bottlenecks at planes co // 4
        for i in range(self.num_convs):
            r = nn.relu(bn(f"b{i}_bn1")(nn.Conv(
                co // 4, (1, 1), use_bias=False, name=f"b{i}_conv1")(
                x_conv)))
            r = nn.relu(bn(f"b{i}_bn2")(nn.Conv(
                co // 4, (3, 3), use_bias=False, name=f"b{i}_conv2")(r)))
            r = bn(f"b{i}_bn3")(nn.Conv(co, (1, 1), use_bias=False,
                                        name=f"b{i}_conv3")(r))
            x_conv = nn.relu(x_conv + r)
        x_conv = x_conv.mean(axis=(1, 2))          # global avg pool
        reg_dim = 4 if self.reg_class_agnostic else self.num_classes * 4
        bbox_pred = nn.Dense(reg_dim,
                             kernel_init=nn.initializers.normal(0.001),
                             name="fc_reg")(x_conv)

        x_fc = x_cls.reshape(x_cls.shape[0], -1)
        for i in range(self.num_fcs):
            x_fc = nn.relu(nn.Dense(
                self.fc_out_channels,
                kernel_init=nn.initializers.xavier_uniform(),
                name=f"fc_branch{i}")(x_fc))
        cls_score = nn.Dense(self.num_classes + 1,
                             kernel_init=nn.initializers.normal(0.01),
                             name="fc_cls")(x_fc)
        return cls_score, bbox_pred, x_fc


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
    pos_sampler: str = "random",
    neg_sampler: str = "random",
    sampler_cfg: Optional[dict] = None,
    cand_cls_score: Optional[jnp.ndarray] = None,  # (B, G+P, C+1) no-grad
    cand_bbox_pred: Optional[jnp.ndarray] = None,  # (B, G+P, C*4) no-grad
    loss_cls=None,
) -> BBoxTargets:
    """``pos_sampler``/``neg_sampler`` select the proposal sampler family
    (``mmdet/core/bbox/samplers/``): 'random' | 'ohem' |
    'instance_balanced' (pos) | 'iou_balanced' | 'score_hlr' (neg).
    OHEM / score-HLR need ``cand_cls_score`` (+ ``cand_bbox_pred`` for
    score-HLR) from a stop-gradient bbox-head forward over the gt+proposal
    slate, plus the loss object for per-candidate losses."""
    b, p, _ = proposals.shape
    g = gt_boxes.shape[1]
    keys = jax.random.split(key, b)
    plain_random = pos_sampler == "random" and neg_sampler == "random"
    cfg = sampler_cfg or {}
    if cand_cls_score is None:
        cand_cls_score = jnp.zeros((b, 0, 0))
        cand_bbox_pred = jnp.zeros((b, 0, 0))
    elif cand_bbox_pred is None:
        cand_bbox_pred = jnp.zeros((b, 0, 0))

    def _one(k, props, pvalid, gtb, gtl, gtv, cscore, cpred):
        if add_gt_as_proposals:
            props = jnp.concatenate([gtb, props], axis=0)
            pvalid = jnp.concatenate([gtv, pvalid], axis=0)
        assigned, overlaps = max_iou_assign(
            props, gtb, gtv, pos_iou_thr, neg_iou_thr, min_pos_iou,
            match_low_quality=False)
        assigned = jnp.where(pvalid, assigned, -1)
        if plain_random:
            inds, is_pos, valid = random_sample_pos_neg(
                k, assigned, num=num_samples, pos_fraction=pos_fraction)
            neg_w = jnp.ones((num_samples,), jnp.float32)
        else:
            from iif_tpu.ops.samplers_extra import (
                sample_pos_neg,
                score_hlr_neg_priority,
            )

            pos_loss = neg_loss = hlr = None
            if pos_sampler == "ohem" or neg_sampler in ("ohem",
                                                        "score_hlr"):
                cand_gt = jnp.clip(assigned - 1, 0, g - 1)
                pos_labels = jnp.where(assigned > 0, gtl[cand_gt],
                                       num_classes)
                pos_loss = loss_cls(cscore, pos_labels, reduction="none")
                neg_loss = loss_cls(
                    cscore, jnp.full_like(pos_labels, num_classes),
                    reduction="none")
            if neg_sampler == "score_hlr":
                sm = jax.nn.softmax(cscore.astype(jnp.float32), -1)
                max_score = sm[:, :num_classes].max(-1)
                arg = sm[:, :num_classes].argmax(-1)
                sel = jnp.take_along_axis(
                    cpred.reshape(cpred.shape[0], -1, 4),
                    arg[:, None, None].repeat(4, -1), axis=1)[:, 0]
                decoded = delta2bbox(props, sel, BBOX_TARGET_MEANS,
                                     BBOX_TARGET_STDS)
                k, k_hlr = jax.random.split(k)
                hlr = score_hlr_neg_priority(
                    k_hlr, assigned, max_score, decoded, neg_loss,
                    num_samples - int(num_samples * pos_fraction),
                    score_thr=cfg.get("score_thr", 0.05),
                    iou_thr=cfg.get("iou_thr", 0.5),
                    bias=cfg.get("bias", 0.0), k=cfg.get("k", 0.5))
            inds, is_pos, valid, neg_w = sample_pos_neg(
                k, assigned, num=num_samples, pos_fraction=pos_fraction,
                pos_sampler=pos_sampler, neg_sampler=neg_sampler,
                max_overlaps=overlaps, pos_loss=pos_loss,
                neg_loss=neg_loss, neg_cfg=cfg, score_hlr=hlr)
        rois = props[inds]
        gt_idx = jnp.clip(assigned[inds] - 1, 0, g - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], num_classes)
        lw = valid.astype(jnp.float32) * neg_w
        tgt = bbox2delta(rois, gtb[gt_idx], BBOX_TARGET_MEANS,
                         BBOX_TARGET_STDS)
        bw = (is_pos & valid).astype(jnp.float32)
        return rois, labels, lw, tgt, bw, gt_idx

    rois, labels, lw, tgt, bw, gi = jax.vmap(_one)(
        keys, proposals, proposal_valid, gt_boxes, gt_labels, gt_valid,
        cand_cls_score, cand_bbox_pred)
    return BBoxTargets(rois, labels, lw, tgt, bw, gi)


def bbox_head_loss(
    cls_score: jnp.ndarray,     # (B*R, C+1)
    bbox_pred: jnp.ndarray,     # (B*R, C*4) or (B*R, 4)
    targets: BBoxTargets,
    loss_cls,
    num_classes: int,
    reg_class_agnostic: bool = False,
    loss_bbox: str = "l1",
    smooth_l1_beta=1.0,     # float or traced scalar (Dynamic R-CNN)
    avg_mode: str = "sum",  # 'sum' (IIF recipe) | 'nonzero' (mmdet's
    #                         count-of-valid; matters when ISR-P /
    #                         score-HLR make label weights fractional)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """loss_cls averaged over valid samples, regression loss over
    positives normalized by total valid samples (``bbox_head.py:256-314``).
    ``loss_bbox``: 'l1' (the IIF/LVIS recipe), 'smooth_l1', or
    'balanced_l1' (Libra R-CNN, ``balanced_l1_loss.py``)."""
    labels = targets.labels.reshape(-1)
    lw = targets.label_weights.reshape(-1)
    bw = targets.bbox_weights.reshape(-1)
    tgt = targets.bbox_targets.reshape(-1, 4)

    avg = ((lw > 0).astype(jnp.float32).sum() if avg_mode == "nonzero"
           else lw.sum())
    l_cls = loss_cls(cls_score, labels, weight=lw, avg_factor=avg)

    if reg_class_agnostic:
        pred = bbox_pred
    else:
        pred = bbox_pred.reshape(-1, num_classes, 4)
        cls_idx = jnp.clip(labels, 0, num_classes - 1)
        pred = jnp.take_along_axis(
            pred, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    if loss_bbox == "smooth_l1":
        per = smooth_l1_loss(pred, tgt, beta=smooth_l1_beta).sum(-1)
    elif loss_bbox == "balanced_l1":
        from iif_tpu.detection.losses_extra import balanced_l1_loss

        per = balanced_l1_loss(pred, tgt).sum(-1)
    else:
        per = jnp.abs(pred - tgt).sum(-1)
    l_bbox = (per * bw).sum() / jnp.maximum(lw.sum(), 1.0)
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
