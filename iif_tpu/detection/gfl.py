"""GFL detector (Generalized Focal Loss), static-shape.

Rebuild of the reference GFL family (``mmdet/models/detectors/gfl.py``,
head ``mmdet/models/dense_heads/gfl_head.py``, losses
``mmdet/models/losses/gfocal_loss.py``, config
``configs/gfl/gfl_r50_fpn_1x_coco.py``): ATSS-style towers and adaptive
assignment, but (1) the classification branch predicts the JOINT
cls-quality score supervised by Quality Focal Loss, and (2) the box
branch predicts a discrete distribution over ``reg_max+1`` bins per side
whose softmax expectation (``Integral``) gives the ltrb distance in
stride units, supervised by Distribution Focal Loss + GIoU.

TPU-first: all levels concatenate into one (B, N, ...) tensor with a
per-anchor stride vector; the per-level python loops of ``loss()`` and
``_get_bboxes`` become masked vector math under one vmap.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.atss import atss_assign, make_atss_anchor_generator
from iif_tpu.detection.losses import iou_loss
from iif_tpu.detection.necks import FPN
from iif_tpu.detection.single_stage import (
    SS_STRIDES,
    SSTestCfg,
    SSTrainCfg,
    _DEPTH_LAYERS,
    _SingleStageBase,
    bias_init_with_prob,
    distance2bbox,
    normal_init,
    ss_fpn_shapes,
)
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.nms import multiclass_nms


def integral_distance(reg_logits: jnp.ndarray, reg_max: int = 16
                      ) -> jnp.ndarray:
    """``gfl_head.py:16-49`` Integral: (..., 4*(reg_max+1)) distribution
    logits -> (..., 4) expected ltrb distances (stride units)."""
    shape = reg_logits.shape[:-1]
    p = jax.nn.softmax(
        reg_logits.reshape(shape + (4, reg_max + 1)), axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=p.dtype)
    return (p * proj).sum(-1)


def bbox2distance(points: jnp.ndarray, bbox: jnp.ndarray,
                  max_dis: Optional[float] = None, eps: float = 0.1
                  ) -> jnp.ndarray:
    """``mmdet/core/bbox/transforms.py`` bbox2distance with the
    reference's clamp to ``max_dis - eps``."""
    d = jnp.stack([points[..., 0] - bbox[..., 0],
                   points[..., 1] - bbox[..., 1],
                   bbox[..., 2] - points[..., 0],
                   bbox[..., 3] - points[..., 1]], axis=-1)
    if max_dis is not None:
        d = jnp.clip(d, 0.0, max_dis - eps)
    return d


def quality_focal_loss(pred: jnp.ndarray,     # (N, C) logits
                       labels: jnp.ndarray,   # (N,) int, C = background
                       score: jnp.ndarray,    # (N,) quality target
                       beta: float = 2.0) -> jnp.ndarray:
    """QFL (``gfocal_loss.py:11-53``): all entries supervised towards 0
    with a sigmoid^beta modulator; the positive (anchor, label) entry
    towards its IoU quality score with |score - p|^beta. Returns (N,)."""
    p = jax.nn.sigmoid(pred)
    bce0 = jnp.maximum(pred, 0) + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    base = bce0 * p ** beta                                  # (N, C)
    c = pred.shape[-1]
    is_pos = labels < c
    col = jnp.clip(labels, 0, c - 1)
    pred_l = jnp.take_along_axis(pred, col[:, None], axis=1)[:, 0]
    p_l = jax.nn.sigmoid(pred_l)
    bce_pos = (jnp.maximum(pred_l, 0) - pred_l * score
               + jnp.log1p(jnp.exp(-jnp.abs(pred_l))))
    pos_term = bce_pos * jnp.abs(score - p_l) ** beta
    base_l = jnp.take_along_axis(base, col[:, None], axis=1)[:, 0]
    return base.sum(-1) + jnp.where(is_pos, pos_term - base_l, 0.0)


def distribution_focal_loss(pred: jnp.ndarray,    # (M, reg_max+1) logits
                            label: jnp.ndarray    # (M,) float in [0, max)
                            ) -> jnp.ndarray:
    """DFL (``gfocal_loss.py:56-80``): CE towards the two integer bins
    bracketing the continuous target, linearly weighted. Returns (M,)."""
    logp = jax.nn.log_softmax(pred, axis=-1)
    left = jnp.floor(label).astype(jnp.int32)
    right = left + 1
    wl = right.astype(label.dtype) - label
    wr = label - left.astype(label.dtype)
    ce_l = -jnp.take_along_axis(logp, left[:, None], axis=1)[:, 0]
    ce_r = -jnp.take_along_axis(
        logp, jnp.clip(right, 0, pred.shape[-1] - 1)[:, None], axis=1)[:, 0]
    return ce_l * wl + ce_r * wr


class GFLHead(nn.Module):
    """``gfl_head.py:120-196``: 4x(conv+GN32+relu) towers, C-channel
    joint cls-quality conv, 4*(reg_max+1) distribution conv with
    per-level learnable scales."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    reg_max: int = 16
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        def tower(prefix):
            return [(nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init, dtype=self.dtype,
                             name=f"{prefix}_conv_{i}"),
                     nn.GroupNorm(num_groups=32, name=f"{prefix}_gn_{i}"))
                    for i in range(self.stacked_convs)]

        cls_tower = tower("cls")
        reg_tower = tower("reg")
        gfl_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="gfl_cls")
        gfl_reg = nn.Conv(4 * (self.reg_max + 1), (3, 3), padding=1,
                          kernel_init=normal_init, name="gfl_reg")
        scales = [self.param(f"scale_{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]
        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            cls_scores.append(gfl_cls(c))
            bbox_preds.append(
                gfl_reg(r).astype(jnp.float32) * scales[lvl])
        return cls_scores, bbox_preds


class GFL(_SingleStageBase):
    """GFL R50-FPN (``configs/gfl/gfl_r50_fpn_1x_coco.py``: FPN
    start_level=1, extra convs on_output, ATSSAssigner topk=9,
    QFL beta=2 weight=1, DFL weight=0.25, GIoU weight=2)."""
    reg_max: int = 16

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs="on_output",
                        dtype=self.compute_dtype, name="neck")
        self.head = GFLHead(self.num_classes, reg_max=self.reg_max,
                            dtype=self.compute_dtype, name="bbox_head")


def _anchor_strides(shapes: Sequence[Tuple[int, int]]) -> np.ndarray:
    return np.concatenate([
        np.full(fh * fw, s, np.float32)
        for (fh, fw), s in zip(shapes, SS_STRIDES)])


def gfl_loss(
    model: GFL,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``gfl_head.py:211-371``: QFL / num_pos; GIoU*2 and DFL*0.25 on
    positives weighted by the detached max joint score, normalized by
    the batch weight sum (the reference's reduce_mean avg_factor)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=GFL.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=GFL.forward_head)

    gen = make_atss_anchor_generator()
    shapes = ss_fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    strides = jnp.asarray(_anchor_strides(shapes))
    level_sizes = [fh * fw for fh, fw in shapes]
    c = model.num_classes
    rm = model.reg_max
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    dists = jnp.concatenate(
        [d.reshape(b, -1, 4 * (rm + 1)) for d in bbox_preds], axis=1)

    centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                         (anchors[:, 1] + anchors[:, 3]) * 0.5], -1)

    def _one(score, dist, gtb, gtl, gtv):
        assigned = atss_assign(anchors, level_sizes, gtb, gtv)
        is_pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], c)
        gt_of = gtb[gt_idx]

        # decode in stride units from anchor centers
        ctr_s = centers / strides[:, None]
        ltrb = integral_distance(dist, rm)                     # (N, 4)
        decoded = distance2bbox(ctr_s, ltrb)
        tgt_s = gt_of / strides[:, None]

        # joint quality target: IoU(decoded, target), positives only
        q = 1.0 - iou_loss(jax.lax.stop_gradient(decoded), tgt_s, "linear")
        q = jnp.where(is_pos, q, 0.0)
        # detached max joint score weights the reg losses
        w = jnp.where(
            is_pos,
            jax.lax.stop_gradient(jax.nn.sigmoid(score)).max(-1), 0.0)

        l_cls = quality_focal_loss(score, labels, q).sum()
        l_bbox = (iou_loss(decoded, tgt_s, "giou") * w).sum() * 2.0
        corners = dist.reshape(-1, rm + 1)                     # (N*4, .)
        tgt_corners = bbox2distance(ctr_s, tgt_s, rm).reshape(-1)
        dfl = distribution_focal_loss(corners, tgt_corners)
        w4 = jnp.repeat(w, 4)
        l_dfl = (dfl * w4).sum() / 4.0 * 0.25
        return l_cls, l_bbox, l_dfl, is_pos.sum(), w.sum()

    lc, lb, ldfl, npos, wsum = jax.vmap(_one)(
        scores.astype(jnp.float32), dists.astype(jnp.float32),
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    avg = jnp.maximum(wsum.sum(), 1.0)
    losses = {"loss_cls": lc.sum() / n, "loss_bbox": lb.sum() / avg,
              "loss_dfl": ldfl.sum() / avg}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def gfl_simple_test(
    model: GFL,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``gfl_head.py:373-470`` _get_bboxes: sigmoid joint scores,
    Integral*stride distances from anchor centers, multiclass NMS."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False, method=GFL.extract_feat)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=GFL.forward_head)
    gen = make_atss_anchor_generator()
    anchors_np = gen.grid_anchors(ss_fpn_shapes((img_h, img_w)))
    c = model.num_classes
    rm = model.reg_max

    lvl_boxes, lvl_scores = [], []
    for s, d, anc, stride in zip(cls_scores, bbox_preds, anchors_np,
                                 SS_STRIDES):
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        d = d.reshape(b, -1, 4 * (rm + 1)).astype(jnp.float32)
        anc = jnp.asarray(anc)
        ctr = jnp.stack([(anc[:, 0] + anc[:, 2]) * 0.5,
                         (anc[:, 1] + anc[:, 3]) * 0.5], -1)
        k = min(cfg.nms_pre, s.shape[1])
        top_i = jax.lax.top_k(s.max(-1), k)[1]
        sel_s = jnp.take_along_axis(s, top_i[..., None], axis=1)
        sel_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        sel_c = jnp.take_along_axis(
            jnp.broadcast_to(ctr[None], (b,) + ctr.shape),
            top_i[..., None], axis=1)
        ltrb = integral_distance(sel_d, rm) * stride
        lvl_boxes.append(distance2bbox(sel_c, ltrb, (img_h, img_w)))
        lvl_scores.append(sel_s)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)

    def _one(bx, sc):
        padded = jnp.concatenate(
            [sc, jnp.zeros((sc.shape[0], 1), sc.dtype)], axis=1)
        return multiclass_nms(bx, padded, cfg.score_thr, cfg.nms_iou,
                              cfg.max_per_img)

    dets, out_scores, labels, det_valid = jax.vmap(_one)(boxes, scores)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}
