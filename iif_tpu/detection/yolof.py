"""YOLOF detector (You Only Look One-level Feature), static-shape.

Rebuild of the reference YOLOF family
(``mmdet/models/detectors/yolof.py``, neck
``mmdet/models/necks/dilated_encoder.py``, head
``mmdet/models/dense_heads/yolof_head.py``, assigner
``mmdet/core/bbox/assigners/uniform_assigner.py``, config
``configs/yolof/yolof_r50_c5_8x8_1x_coco.py``): C5-only backbone ->
DilatedEncoder (lateral 1x1 + 3x3, then 4 dilated residual bottlenecks)
-> a single-level head with 5 square anchors/cell, implicit-objectness
classification, center-clamped delta decoding (ctr_clamp=32), focal cls
+ GIoU reg, and UNIFORM MATCHING: each gt takes the top-4 anchors AND
top-4 predicted boxes by L1 cxcywh distance, ignoring matches whose
anchor IoU < 0.15 and negatives whose predicted IoU > 0.7.

TPU-first: the reference's duplicate-index scatter (last write wins)
becomes a vectorized segment-max "last writer" resolution; everything
runs as one vmapped static-shape program.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.losses import iou_loss, sigmoid_focal_loss
from iif_tpu.detection.single_stage import (
    SSTestCfg,
    SSTrainCfg,
    _DEPTH_LAYERS,
    _SingleStageBase,
    bias_init_with_prob,
    normal_init,
)
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.nms import multiclass_nms

YOLOF_STRIDE = 32
CTR_CLAMP = 32.0
_INF = 1e8

xavier_init = nn.initializers.variance_scaling(1.0, "fan_in", "uniform")


def make_yolof_anchor_generator() -> AnchorGenerator:
    """5 square anchors per cell at stride 32
    (``yolof_r50_c5_8x8_1x_coco.py``: scales [1,2,4,8,16])."""
    return AnchorGenerator(strides=[YOLOF_STRIDE], ratios=[1.0],
                           scales=[1.0, 2.0, 4.0, 8.0, 16.0])


class DilatedEncoderNeck(nn.Module):
    """``dilated_encoder.py:52-108``: 1x1+BN lateral, 3x3+BN, then 4
    residual bottlenecks with dilations (2, 4, 6, 8)."""
    out_channels: int = 512
    block_mid_channels: int = 128
    dilations: Tuple[int, ...] = (2, 4, 6, 8)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        out = bn("lateral_norm")(nn.Conv(
            self.out_channels, (1, 1), kernel_init=xavier_init,
            dtype=self.dtype, name="lateral_conv")(x))
        out = bn("fpn_norm")(nn.Conv(
            self.out_channels, (3, 3), padding=1, kernel_init=xavier_init,
            dtype=self.dtype, name="fpn_conv")(out))
        for i, d in enumerate(self.dilations):
            identity = out
            h = nn.relu(bn(f"block{i}_bn1")(nn.Conv(
                self.block_mid_channels, (1, 1), kernel_init=normal_init,
                dtype=self.dtype, name=f"block{i}_conv1")(out)))
            h = nn.relu(bn(f"block{i}_bn2")(nn.Conv(
                self.block_mid_channels, (3, 3), padding=d,
                kernel_dilation=(d, d), kernel_init=normal_init,
                dtype=self.dtype, name=f"block{i}_conv2")(h)))
            h = nn.relu(bn(f"block{i}_bn3")(nn.Conv(
                self.out_channels, (1, 1), kernel_init=normal_init,
                dtype=self.dtype, name=f"block{i}_conv3")(h)))
            out = h + identity
        return out


class YOLOFHead(nn.Module):
    """``yolof_head.py:43-135``: 2-conv cls subnet / 4-conv reg subnet
    (BN+relu), A*C cls, A*4 reg, A implicit-objectness; the normalized
    score is cls + obj - log(1 + e^cls + e^obj)."""
    num_classes: int
    num_anchors: int = 5
    feat_channels: int = 512
    num_cls_convs: int = 2
    num_reg_convs: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        c = x
        for i in range(self.num_cls_convs):
            c = nn.relu(bn(f"cls_bn{i}")(nn.Conv(
                self.feat_channels, (3, 3), padding=1,
                kernel_init=normal_init, dtype=self.dtype,
                name=f"cls_conv{i}")(c)))
        r = x
        for i in range(self.num_reg_convs):
            r = nn.relu(bn(f"reg_bn{i}")(nn.Conv(
                self.feat_channels, (3, 3), padding=1,
                kernel_init=normal_init, dtype=self.dtype,
                name=f"reg_conv{i}")(r)))
        cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=1,
            kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="cls_score")(c).astype(jnp.float32)
        reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                      kernel_init=normal_init,
                      name="bbox_pred")(r).astype(jnp.float32)
        obj = nn.Conv(self.num_anchors, (3, 3), padding=1,
                      kernel_init=normal_init,
                      name="object_pred")(r).astype(jnp.float32)
        b, fh, fw, _ = cls.shape
        cls = cls.reshape(b, fh, fw, self.num_anchors, self.num_classes)
        obj = obj.reshape(b, fh, fw, self.num_anchors, 1)
        norm = cls + obj - jnp.log(
            1.0 + jnp.clip(jnp.exp(cls), None, _INF)
            + jnp.clip(jnp.exp(obj), None, _INF))
        return (norm.reshape(b, fh * fw * self.num_anchors,
                             self.num_classes),
                reg.reshape(b, fh * fw * self.num_anchors, 4))


class YOLOF(_SingleStageBase):
    """YOLOF R50-C5 (pytorch-style stem in place of the reference's
    caffe-style torchvision C5 — a documented stylistic substitution)."""

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = DilatedEncoderNeck(dtype=self.compute_dtype,
                                       name="neck")
        self.head = YOLOFHead(self.num_classes, dtype=self.compute_dtype,
                              name="bbox_head")

    def forward_all(self, images: jnp.ndarray, train: bool = False):
        from iif_tpu.detection.detector import normalize_if_uint8

        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        c5 = self.neck(feats[-1], train=train)
        return self.head(c5, train=train)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        return self.forward_all(images, train)


def delta2bbox_ctr_clamp(anchors: jnp.ndarray, deltas: jnp.ndarray,
                         max_shape: Optional[Tuple[int, int]] = None,
                         ctr_clamp: float = CTR_CLAMP) -> jnp.ndarray:
    """``delta_xywh_bbox_coder.py`` decode with ``add_ctr_clamp=True``:
    the center shift dxy*wh is clamped to +-ctr_clamp px and dwh to the
    standard ratio clip."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    dx, dy, dw, dh = (deltas[..., 0], deltas[..., 1], deltas[..., 2],
                      deltas[..., 3])
    max_ratio = float(np.abs(np.log(16.0 / 1000)))
    dx_w = jnp.clip(dx * aw, -ctr_clamp, ctr_clamp)
    dy_h = jnp.clip(dy * ah, -ctr_clamp, ctr_clamp)
    dw = jnp.clip(dw, None, max_ratio)
    dh = jnp.clip(dh, None, max_ratio)
    cx = ax + dx_w
    cy = ay + dy_h
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    boxes = jnp.stack([cx - w * 0.5, cy - h * 0.5,
                       cx + w * 0.5, cy + h * 0.5], -1)
    if max_shape is not None:
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, max_shape[1]),
            jnp.clip(boxes[..., 1], 0, max_shape[0]),
            jnp.clip(boxes[..., 2], 0, max_shape[1]),
            jnp.clip(boxes[..., 3], 0, max_shape[0])], -1)
    return boxes


def _cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([(b[..., 0] + b[..., 2]) * 0.5,
                      (b[..., 1] + b[..., 3]) * 0.5,
                      b[..., 2] - b[..., 0],
                      b[..., 3] - b[..., 1]], -1)


def _iou_mat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(aa[:, None] + ab[None] - inter, 1e-6)


def uniform_match(
    pred_boxes: jnp.ndarray,   # (N, 4) decoded
    anchors: jnp.ndarray,      # (N, 4)
    gt_boxes: jnp.ndarray,     # (G, 4) padded
    gt_valid: jnp.ndarray,     # (G,)
    match_times: int = 4,
    pos_ignore_thr: float = 0.15,
    neg_ignore_thr: float = 0.7,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``uniform_assigner.py:36-140``. Returns
    (assigned (N,) int32 {-1 ignore, 0 bg, i+1 gt}, match_idx (M,) anchor
    index per matched pair, match_gt (M,) gt index, pair_pos (M,) bool —
    pair survives the pos-IoU filter and its gt is valid),
    M = 2 * match_times * G in the reference's scatter order."""
    n, g = pred_boxes.shape[0], gt_boxes.shape[0]
    gt_c = _cxcywh(gt_boxes)
    cost_pred = jnp.abs(_cxcywh(pred_boxes)[:, None] - gt_c[None]).sum(-1)
    cost_anc = jnp.abs(_cxcywh(anchors)[:, None] - gt_c[None]).sum(-1)
    idx_pred = jax.lax.top_k(-cost_pred.T, match_times)[1]   # (G, K)
    idx_anc = jax.lax.top_k(-cost_anc.T, match_times)[1]

    # reference order: cat((index, index1), dim=1).reshape(-1) with
    # shape (K, 2G): row-major k, then [pred block | anchor block]
    rows = jnp.concatenate([idx_pred.T, idx_anc.T], axis=1)   # (K, 2G)
    match_idx = rows.reshape(-1)                              # (2KG,)
    match_gt = jnp.tile(jnp.arange(g), 2 * match_times)

    anchor_iou = _iou_mat(anchors, gt_boxes)
    pred_iou = _iou_mat(pred_boxes, gt_boxes)
    pred_iou = jnp.where(gt_valid[None, :], pred_iou, 0.0)
    pos_ious = anchor_iou[match_idx, match_gt]
    pair_live = gt_valid[match_gt]
    pair_pos = (pos_ious >= pos_ignore_thr) & pair_live

    # scatter with last-write-wins over live pairs only
    vals = jnp.where(pair_pos, match_gt + 1, -1)
    order = jnp.where(pair_live, jnp.arange(match_idx.shape[0]), -1)
    seg = jax.ops.segment_max(order, match_idx, num_segments=n)
    written = seg >= 0
    winner_vals = vals[jnp.clip(seg, 0)]

    assigned = jnp.zeros(n, jnp.int32)
    neg_ignore = pred_iou.max(-1) > neg_ignore_thr
    assigned = jnp.where(neg_ignore, -1, assigned)
    assigned = jnp.where(written, winner_vals, assigned)
    return assigned, match_idx, match_gt, pair_pos


def yolof_loss(
    model: YOLOF,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``yolof_head.py:137-223``: focal cls over non-ignored anchors +
    GIoU over ALL matched (pred, gt) pairs weighted by the pos filter,
    both / num_pos."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    (scores, deltas), mutated = model.apply(
        variables, images, True, method=YOLOF.forward_all,
        mutable=["batch_stats"])
    gen = make_yolof_anchor_generator()
    fh, fw = -(-img_h // YOLOF_STRIDE), -(-img_w // YOLOF_STRIDE)
    anchors = jnp.asarray(gen.grid_anchors([(fh, fw)])[0])
    c = model.num_classes

    def _one(score, delta, gtb, gtl, gtv):
        decoded = delta2bbox_ctr_clamp(anchors, delta)
        assigned, midx, mgt, ppos = uniform_match(
            jax.lax.stop_gradient(decoded), anchors, gtb, gtv)
        is_pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], c)
        w = (assigned >= 0).astype(jnp.float32)   # ignored: weight 0
        l_cls = (sigmoid_focal_loss(score, labels, c, cfg.gamma,
                                    cfg.alpha) * w).sum()
        # GIoU over matched pairs (pred box gathered per pair)
        pair_pred = decoded[midx]
        pair_tgt = gtb[mgt]
        l_bbox = (iou_loss(pair_pred, pair_tgt, "giou")
                  * ppos.astype(jnp.float32)).sum()
        return l_cls, l_bbox, is_pos.sum()

    lc, lb, npos = jax.vmap(_one)(
        scores, deltas, batch["gt_boxes"], batch["gt_labels"],
        batch["gt_valid"])
    n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    losses = {"loss_cls": lc.sum() / n, "loss_bbox": lb.sum() / n}
    total = losses["loss_cls"] + losses["loss_bbox"]
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def yolof_simple_test(
    model: YOLOF,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """AnchorHead get_bboxes on the single level (nms iou 0.6 in the
    reference test_cfg; passed through ``cfg.nms_iou``)."""
    b, img_h, img_w, _ = images.shape
    scores, deltas = model.apply(variables, images, False,
                                 method=YOLOF.forward_all)
    gen = make_yolof_anchor_generator()
    fh, fw = -(-img_h // YOLOF_STRIDE), -(-img_w // YOLOF_STRIDE)
    anchors = jnp.asarray(gen.grid_anchors([(fh, fw)])[0])
    c = model.num_classes
    s = jax.nn.sigmoid(scores.astype(jnp.float32))
    k = min(cfg.nms_pre, s.shape[1])
    top_i = jax.lax.top_k(s.max(-1), k)[1]
    sel_s = jnp.take_along_axis(s, top_i[..., None], axis=1)
    sel_d = jnp.take_along_axis(deltas, top_i[..., None], axis=1)
    sel_a = jnp.take_along_axis(
        jnp.broadcast_to(anchors[None], (b,) + anchors.shape),
        top_i[..., None], axis=1)
    boxes = delta2bbox_ctr_clamp(sel_a, sel_d, max_shape=(img_h, img_w))

    def _one(bx, sc):
        padded = jnp.concatenate(
            [sc, jnp.zeros((sc.shape[0], 1), sc.dtype)], axis=1)
        return multiclass_nms(bx, padded, cfg.score_thr, cfg.nms_iou,
                              cfg.max_per_img)

    dets, out_scores, labels, det_valid = jax.vmap(_one)(boxes, sel_s)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}
