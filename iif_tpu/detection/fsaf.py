"""FSAF detector (Feature Selective Anchor-Free), static-shape.

Rebuild of the reference FSAF family (``mmdet/models/detectors/fsaf.py``,
head ``mmdet/models/dense_heads/fsaf_head.py``, assigner
``mmdet/core/bbox/assigners/center_region_assigner.py``, coder
``mmdet/core/bbox/coder/tblr_bbox_coder.py``, config
``configs/fsaf/fsaf_r50_fpn_1x_coco.py``): RetinaNet towers with ONE
point-anchor per cell, TBLR box coding (normalizer 4, by anchor wh),
center-region assignment (pos/neg scale 0.2, min_pos_iof 0.01, smaller
gt wins), focal cls + -log(IoU) reg on decoded boxes, and ONLINE FEATURE
SELECTION: each gt backpropagates only through the pyramid level where
its mean (cls+reg) loss is smallest; positives at other levels are
demoted to background with their gt-class logit masked out.

TPU-first: the reference's per-level loops, nonzero() index surgery and
``collect/reweight_loss_single`` become (N, G) / (L, G) einsum masks in
one vmapped program.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.losses import iou_loss
from iif_tpu.detection.necks import FPN
from iif_tpu.detection.single_stage import (
    SS_STRIDES,
    RetinaHead,
    SSTestCfg,
    SSTrainCfg,
    _DEPTH_LAYERS,
    _SingleStageBase,
    ss_fpn_shapes,
)
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.nms import multiclass_nms

_INF = 1e8
TBLR_NORMALIZER = 4.0


def make_fsaf_anchor_generator() -> AnchorGenerator:
    """One stride-sized square anchor per cell
    (``fsaf_r50_fpn_1x_coco.py``: octave_base_scale=1, ratios [1.0])."""
    return AnchorGenerator(strides=list(SS_STRIDES), ratios=[1.0],
                           scales=[1.0])


class FSAFHead(RetinaHead):
    """RetinaHead with num_anchors=1 and relu'd bbox branch
    (``fsaf_head.py:63-79``: TBLR accepts only positive distances; the
    reg conv's bias is initialized to 0.25 to avoid zero-area boxes)."""

    @nn.compact
    def __call__(self, feats):
        from iif_tpu.detection.single_stage import (
            bias_init_with_prob,
            normal_init,
        )

        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init, dtype=self.dtype,
                             name=f"cls_conv_{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init, dtype=self.dtype,
                             name=f"reg_conv_{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="retina_cls")
        retina_reg = nn.Conv(
            4, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(0.25), name="retina_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            c = r = x
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_scores.append(retina_cls(c))
            bbox_preds.append(nn.relu(retina_reg(r)))
        return cls_scores, bbox_preds


class FSAF(_SingleStageBase):
    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs="on_input",
                        dtype=self.compute_dtype, name="neck")
        self.head = FSAFHead(self.num_classes, num_anchors=1,
                             dtype=self.compute_dtype, name="bbox_head")


# ------------------------------------------------------------- TBLR coder
def tblr2bboxes(priors: jnp.ndarray, tblr: jnp.ndarray,
                normalizer: float = TBLR_NORMALIZER,
                max_shape: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """``tblr_bbox_coder.py:124-199``: tblr * normalizer * (h,h,w,w) of
    the prior, offset from the prior center."""
    loc = tblr * normalizer
    cx = (priors[..., 0] + priors[..., 2]) * 0.5
    cy = (priors[..., 1] + priors[..., 3]) * 0.5
    w = priors[..., 2] - priors[..., 0]
    h = priors[..., 3] - priors[..., 1]
    top, bottom, left, right = (loc[..., 0] * h, loc[..., 1] * h,
                                loc[..., 2] * w, loc[..., 3] * w)
    boxes = jnp.stack([cx - left, cy - top, cx + right, cy + bottom], -1)
    if max_shape is not None:
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, max_shape[1]),
            jnp.clip(boxes[..., 1], 0, max_shape[0]),
            jnp.clip(boxes[..., 2], 0, max_shape[1]),
            jnp.clip(boxes[..., 3], 0, max_shape[0])], -1)
    return boxes


def _scale_boxes(boxes: jnp.ndarray, scale: float) -> jnp.ndarray:
    """``center_region_assigner.py:10-34``."""
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5
    wh = (boxes[..., 2:] - boxes[..., :2]) * 0.5 * scale
    return jnp.stack([cx - wh[..., 0], cy - wh[..., 1],
                      cx + wh[..., 0], cy + wh[..., 1]], -1)


def _iof(anchors: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Intersection-over-foreground(anchor area), (N, G)."""
    lt = jnp.maximum(anchors[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(anchors[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = ((anchors[:, 2] - anchors[:, 0])
            * (anchors[:, 3] - anchors[:, 1]))[:, None]
    return inter / jnp.maximum(area, 1e-6)


def center_region_assign(
    anchors: jnp.ndarray,      # (N, 4)
    gt_boxes: jnp.ndarray,     # (G, 4) padded
    gt_valid: jnp.ndarray,     # (G,)
    pos_scale: float = 0.2,
    neg_scale: float = 0.2,
    min_pos_iof: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``center_region_assigner.py:72-320``: anchors whose center lies in
    the pos_scale-shrunk core of a gt (and iof > min_pos_iof) are
    positive — the SMALLEST-area gt wins ties; anchors in the
    neg_scale-shrunk shadow of a gt (but not its core) have that gt's
    class ignored. Returns (assigned (N,) 0=bg / i+1=gt i,
    shadow (N, G) bool)."""
    core = _scale_boxes(gt_boxes, pos_scale)
    shadow_box = _scale_boxes(gt_boxes, neg_scale)
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    in_gt = ((acx[:, None] > gt_boxes[None, :, 0])
             & (acx[:, None] < gt_boxes[None, :, 2])
             & (acy[:, None] > gt_boxes[None, :, 1])
             & (acy[:, None] < gt_boxes[None, :, 3]))
    in_core = in_gt & (_iof(anchors, core) > min_pos_iof) \
        & gt_valid[None, :]
    in_shadow = (_iof(anchors, shadow_box) > min_pos_iof) \
        & ~in_core & gt_valid[None, :]

    areas = ((gt_boxes[:, 2] - gt_boxes[:, 0])
             * (gt_boxes[:, 3] - gt_boxes[:, 1]))
    masked = jnp.where(in_core, areas[None, :], _INF)
    best = masked.argmin(-1).astype(jnp.int32)
    is_pos = masked.min(-1) < _INF * 0.5
    assigned = jnp.where(is_pos, best + 1, 0)
    # anchors in the core of SEVERAL gts: the losing gts are shadowed too
    # (center_region_assigner.py:323-330)
    win = jax.nn.one_hot(best, gt_boxes.shape[0], dtype=bool) \
        & is_pos[:, None]
    shadow = in_shadow | (in_core & ~win)
    return assigned, shadow


def fsaf_loss(
    model: FSAF,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``fsaf_head.py:188-316`` loss with online level selection."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=FSAF.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=FSAF.forward_head)

    gen = make_fsaf_anchor_generator()
    shapes = ss_fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    level_of = jnp.asarray(np.concatenate([
        np.full(fh * fw, lv, np.int32)
        for lv, (fh, fw) in enumerate(shapes)]))
    num_levels = len(shapes)
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    tblr = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1)
    g = batch["gt_boxes"].shape[1]

    def _one(score, pred, gtb, gtl, gtv):
        pred = jnp.clip(pred, 1e-4)  # avoid 0-area (fsaf_head.py:215)
        assigned, shadow = center_region_assign(anchors, gtb, gtv)
        is_pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], c)

        # shadowed (anchor, class) pairs: zero cls weight for that class
        # (fsaf_head.py:160-175). An anchor both positive for AND
        # shadowed by the same class is demoted to background
        # (center_region_assigner.py:240-248, foreground_dominate=False)
        shadow_cls = jnp.zeros((anchors.shape[0], c), bool)
        gcls = jax.nn.one_hot(gtl, c, dtype=bool)       # (G, C)
        shadow_cls = (shadow[:, :, None] & gcls[None]).any(1)   # (N, C)
        own_shadowed = jnp.take_along_axis(
            shadow_cls, jnp.clip(labels, 0, c - 1)[:, None], axis=1)[:, 0]
        demote = is_pos & own_shadowed
        is_pos = is_pos & ~demote
        labels = jnp.where(demote, c, labels)

        # per-(anchor, class) focal loss with shadow masking
        t = jax.nn.one_hot(labels, c, dtype=jnp.float32)
        logits = score.astype(jnp.float32)
        p = jax.nn.sigmoid(logits)
        ce = (jnp.maximum(logits, 0) - logits * t
              + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        p_t = p * t + (1.0 - p) * (1.0 - t)
        alpha_t = cfg.alpha * t + (1.0 - cfg.alpha) * (1.0 - t)
        cls_elem = alpha_t * (1.0 - p_t) ** cfg.gamma * ce      # (N, C)
        cls_w = jnp.where(shadow_cls & (t == 0), 0.0, 1.0)

        decoded = tblr2bboxes(anchors, pred)
        reg_elem = iou_loss(decoded, gtb[gt_idx], "log")        # (N,)
        reg_elem = jnp.where(is_pos, reg_elem, 0.0)

        # online feature selection: mean (cls+reg) loss of each gt at
        # each level; argmin level keeps the gradient
        per_anchor = jax.lax.stop_gradient(
            (cls_elem * cls_w).sum(-1) + reg_elem)              # (N,)
        pos_onehot = (jax.nn.one_hot(gt_idx, g) * is_pos[:, None])
        lvl_onehot = jax.nn.one_hot(level_of, num_levels)       # (N, L)
        sums = jnp.einsum("n,ng,nl->lg", per_anchor, pos_onehot,
                          lvl_onehot)
        cnts = jnp.einsum("ng,nl->lg", pos_onehot, lvl_onehot)
        mean_lg = jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), 1e6)
        min_level = mean_lg.argmin(0)                            # (G,)

        keep = is_pos & (min_level[gt_idx] == level_of)
        # demoted positives: reg zeroed; their gt-class logit masked
        drop = is_pos & ~keep
        drop_cls_mask = jax.nn.one_hot(
            jnp.clip(labels, 0, c - 1), c, dtype=bool) & drop[:, None]
        # a dropped positive becomes a background anchor whose one-hot
        # target column is removed from the loss
        t2 = jnp.where(drop[:, None], 0.0, t)
        p_t2 = p * t2 + (1.0 - p) * (1.0 - t2)
        alpha_t2 = cfg.alpha * t2 + (1.0 - cfg.alpha) * (1.0 - t2)
        ce2 = (jnp.maximum(logits, 0) - logits * t2
               + jnp.log1p(jnp.exp(-jnp.abs(logits))))
        cls_elem2 = alpha_t2 * (1.0 - p_t2) ** cfg.gamma * ce2
        cls_w2 = jnp.where((shadow_cls & (t2 == 0)) | drop_cls_mask,
                           0.0, cls_w)
        l_cls = (cls_elem2 * cls_w2).sum()
        l_reg = (reg_elem * keep).sum()
        return l_cls, l_reg, keep.sum()

    lc, lb, npos = jax.vmap(_one)(scores, tblr.astype(jnp.float32),
                                  batch["gt_boxes"], batch["gt_labels"],
                                  batch["gt_valid"])
    avg = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    losses = {"loss_cls": lc.sum() / avg, "loss_bbox": lb.sum() / avg}
    total = losses["loss_cls"] + losses["loss_bbox"]
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def fsaf_simple_test(
    model: FSAF,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """RetinaNet-style get_bboxes with the TBLR decode."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False, method=FSAF.extract_feat)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=FSAF.forward_head)
    gen = make_fsaf_anchor_generator()
    anchors_np = gen.grid_anchors(ss_fpn_shapes((img_h, img_w)))
    c = model.num_classes

    lvl_boxes, lvl_scores = [], []
    for s, d, anc in zip(cls_scores, bbox_preds, anchors_np):
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        d = d.reshape(b, -1, 4).astype(jnp.float32)
        anc = jnp.asarray(anc)
        k = min(cfg.nms_pre, s.shape[1])
        top_i = jax.lax.top_k(s.max(-1), k)[1]
        sel_s = jnp.take_along_axis(s, top_i[..., None], axis=1)
        sel_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        sel_a = jnp.take_along_axis(
            jnp.broadcast_to(anc[None], (b,) + anc.shape),
            top_i[..., None], axis=1)
        lvl_boxes.append(tblr2bboxes(sel_a, sel_d,
                                     max_shape=(img_h, img_w)))
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
