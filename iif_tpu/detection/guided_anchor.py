"""Guided Anchoring: GA-RetinaNet (CVPR 2019).

TPU-native rebuild of the reference's ``GuidedAnchorHead``/``GARetinaHead``
(``mmdet/models/dense_heads/guided_anchor_head.py:60-760``,
``ga_retina_head.py:11-117``; config
``configs/guided_anchoring/ga_retinanet_r50_fpn_1x_coco.py``):

- a 1-channel *location* branch trained with focal loss on painted
  center/ignore/negative regions (``ga_loc_targets``, :375-475);
- a 2-channel *shape* branch trained with bounded-IoU loss against the
  best-matching gt of each square cell, where matching uses the max IoU
  over the 9 octave "approx" anchors of the cell
  (``ApproxMaxIoUAssigner``);
- *feature adaption*: a 3x3 deformable conv whose offsets come from the
  (detached) shape prediction;
- cls/reg heads running on adapted features against the *guided
  anchors* — squares reshaped by the predicted shapes.

TPU notes: the reference's MaskedConv2d only skips computation at
inference — on TPU the dense conv is the fast path, so masking is
applied to the *scores* instead; the per-gt sequential region painting
becomes an order-independent union (center regions take precedence over
ignore regions — the reference's paint order makes cross-gt overlaps
depend on gt order, a measure-zero semantic difference).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.losses import sigmoid_focal_loss, smooth_l1_loss
from iif_tpu.detection.single_stage import (
    SS_STRIDES,
    RetinaNet,
    SSTestCfg,
    SSTrainCfg,
    make_retina_anchor_generator,
    ss_fpn_shapes,
)
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.boxes import bbox_overlaps, bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms


def make_square_anchor_generator() -> AnchorGenerator:
    """Square anchors: scales [4], ratios [1] (ga_retinanet config)."""
    return AnchorGenerator(strides=list(SS_STRIDES), ratios=[1.0],
                           scales=[4.0])


def bounded_iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     beta: float = 0.2, eps: float = 1e-3) -> jnp.ndarray:
    """Elementwise bounded-IoU loss, (n, 4) rows [dx, dy, dw, dh]
    (``iou_loss.py:55-100``)."""
    pcx = (pred[:, 0] + pred[:, 2]) * 0.5
    pcy = (pred[:, 1] + pred[:, 3]) * 0.5
    pw = pred[:, 2] - pred[:, 0]
    ph = pred[:, 3] - pred[:, 1]
    t = jax.lax.stop_gradient(target)
    tcx = (t[:, 0] + t[:, 2]) * 0.5
    tcy = (t[:, 1] + t[:, 3]) * 0.5
    tw = t[:, 2] - t[:, 0]
    th = t[:, 3] - t[:, 1]
    dx = tcx - pcx
    dy = tcy - pcy
    ldx = 1 - jnp.maximum((tw - 2 * jnp.abs(dx))
                          / (tw + 2 * jnp.abs(dx) + eps), 0.0)
    ldy = 1 - jnp.maximum((th - 2 * jnp.abs(dy))
                          / (th + 2 * jnp.abs(dy) + eps), 0.0)
    ldw = 1 - jnp.minimum(tw / (pw + eps), pw / (tw + eps))
    ldh = 1 - jnp.minimum(th / (ph + eps), ph / (th + eps))
    comb = jnp.stack([ldx, ldy, ldw, ldh], axis=-1)
    return jnp.where(comb < beta, 0.5 * comb * comb / beta,
                     comb - 0.5 * beta)


def approx_max_iou_overlaps(approxs: jnp.ndarray,   # (A, P, 4)
                            gt_boxes: jnp.ndarray,  # (G, 4)
                            gt_valid: jnp.ndarray) -> jnp.ndarray:
    """Per-square overlaps = max IoU over the cell's P octave approxs
    (``approx_max_iou_assigner.py:60-115``). Returns (A, G)."""
    a, p, _ = approxs.shape
    iou = bbox_overlaps(approxs.reshape(a * p, 4), gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)
    return iou.reshape(a, p, -1).max(axis=1)


class FeatureAdaption(nn.Module):
    """3x3 deform conv with offsets predicted from the (detached) shape
    prediction (``guided_anchor_head.py:15-56``); ``deform_groups``
    channel groups each get their own offset field."""
    deform_groups: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, shape_pred: jnp.ndarray
                 ) -> jnp.ndarray:
        from iif_tpu.ops.deform import deform_conv2d

        c = x.shape[-1]
        g = self.deform_groups
        off = nn.Conv(g * 18, (1, 1), use_bias=False,
                      kernel_init=nn.initializers.normal(0.1),
                      name="conv_offset")(
            jax.lax.stop_gradient(shape_pred).astype(jnp.float32))
        b, h, w, _ = off.shape
        off = off.reshape(b, h, w, g, 9, 2)
        w_ada = self.param("conv_adaption",
                           nn.initializers.normal(0.01),
                           (3, 3, c // g, c))
        outs = []
        for gi in range(g):
            outs.append(deform_conv2d(
                x[..., gi * (c // g):(gi + 1) * (c // g)],
                off[:, :, :, gi],
                w_ada[:, :, :, gi * (c // g):(gi + 1) * (c // g)]))
        return nn.relu(sum(outs))


class GARetinaHead(nn.Module):
    """GA retina head (``ga_retina_head.py:44-117``): 4-conv towers,
    loc (1ch) + shape (2ch) predictors, per-branch feature adaption,
    1-anchor cls/reg convs."""
    num_classes: int
    stacked_convs: int = 4
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_convs = [nn.Conv(self.feat_channels, (3, 3),
                             kernel_init=nn.initializers.normal(0.01),
                             name=f"cls_conv{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3),
                             kernel_init=nn.initializers.normal(0.01),
                             name=f"reg_conv{i}")
                     for i in range(self.stacked_convs)]
        bias_prior = nn.initializers.constant(-float(np.log((1 - .01) / .01)))
        conv_loc = nn.Conv(1, (1, 1),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_prior, name="conv_loc")
        conv_shape = nn.Conv(2, (1, 1),
                             kernel_init=nn.initializers.normal(0.01),
                             name="conv_shape")
        ada_cls = FeatureAdaption(name="feature_adaption_cls")
        ada_reg = FeatureAdaption(name="feature_adaption_reg")
        conv_cls = nn.Conv(self.num_classes, (3, 3),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=bias_prior, name="retina_cls")
        conv_reg = nn.Conv(4, (3, 3),
                           kernel_init=nn.initializers.normal(0.01),
                           name="retina_reg")

        outs = []
        for x in feats:
            cf = rf = x
            for c_ in cls_convs:
                cf = nn.relu(c_(cf))
            for c_ in reg_convs:
                rf = nn.relu(c_(rf))
            loc = conv_loc(cf)
            shape = conv_shape(rf)
            cf = ada_cls(cf, shape)
            rf = ada_reg(rf, shape)
            outs.append((conv_cls(cf), conv_reg(rf), shape, loc))
        return tuple(zip(*outs))    # (cls, reg, shape, loc) per level


class GARetinaNet(RetinaNet):
    """ResNet+FPN body from RetinaNet with the GA head."""

    loc_filter_thr: float = 0.01
    center_ratio: float = 0.2
    ignore_ratio: float = 0.5

    def setup(self):
        super().setup()
        self.ga_head = GARetinaHead(self.num_classes, name="ga_head")

    def forward_head(self, fpn_feats):
        return self.ga_head(fpn_feats)

    def __call__(self, images, train: bool = False):
        # trace path must touch ga_head (the inherited one would init
        # the unused stock retina head instead)
        feats = self.extract_feat(images, train=train)
        return self.ga_head(feats)


def _level_squares(shapes) -> Tuple[jnp.ndarray, ...]:
    gen = make_square_anchor_generator()
    return tuple(jnp.asarray(a) for a in gen.grid_anchors(shapes))


def guided_anchors(squares: jnp.ndarray, shape_pred: jnp.ndarray
                   ) -> jnp.ndarray:
    """Decode squares + (dw, dh) into guided anchors
    (``get_anchors``/``gen guided``; anchor_coder stds 1, wh_ratio_clip
    1e-6). shape_pred (A, 2)."""
    deltas = jnp.concatenate(
        [jnp.zeros_like(shape_pred), shape_pred], axis=-1)
    return delta2bbox(squares, deltas, wh_ratio_clip=1e-6)


def ga_loc_targets(gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
                   shapes, strides=SS_STRIDES, octave_base_scale: int = 4,
                   center_ratio: float = 0.2, ignore_ratio: float = 0.5):
    """Painted location targets (``ga_loc_targets``,
    ``guided_anchor_head.py:375-475``): per gt, its scale picks a level;
    the center region is positive, the ignore-ratio region (also on the
    two adjacent levels) has weight 0, the rest weight 0.1. Returns per
    level (target (G?,H,W), weight) for ONE image, plus avg factor is
    computed by the caller."""
    num_lvls = len(shapes)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = jnp.sqrt((gt_boxes[:, 2] - gt_boxes[:, 0])
                     * (gt_boxes[:, 3] - gt_boxes[:, 1]))
    min_size = float(octave_base_scale * strides[0])
    tgt_lvl = jnp.clip(jnp.floor(jnp.log2(scale / min_size) + 0.5),
                       0, num_lvls - 1).astype(jnp.int32)

    def region_mask(boxes, r, h, w, active):
        # cells inside round((1-r)*edge + r*opposite) per gt, any-reduced
        x1 = jnp.round((1 - r) * boxes[:, 0] + r * boxes[:, 2])
        y1 = jnp.round((1 - r) * boxes[:, 1] + r * boxes[:, 3])
        x2 = jnp.round(r * boxes[:, 0] + (1 - r) * boxes[:, 2])
        y2 = jnp.round(r * boxes[:, 1] + (1 - r) * boxes[:, 3])
        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)
        in_x = (xs[None, :] >= x1[:, None]) & (xs[None, :] <= x2[:, None])
        in_y = (ys[None, :] >= y1[:, None]) & (ys[None, :] <= y2[:, None])
        m = in_y[:, :, None] & in_x[:, None, :] & active[:, None, None]
        return m.any(axis=0)

    targets, weights = [], []
    for lvl in range(num_lvls):
        h, w = shapes[lvl]
        fb = gt_boxes / strides[lvl]
        on_lvl = gt_valid & (tgt_lvl == lvl)
        ctr = region_mask(fb, r1, h, w, on_lvl)
        ign = region_mask(fb, r2, h, w, on_lvl)
        near = gt_valid & ((tgt_lvl == lvl - 1) | (tgt_lvl == lvl + 1))
        ign_near = region_mask(fb, r2, h, w, near)
        weight = jnp.where(ctr, 1.0,
                           jnp.where(ign | ign_near, 0.0, 0.1))
        targets.append(ctr.astype(jnp.float32))
        weights.append(weight)
    return targets, weights


def ga_retina_loss(
    model: GARetinaNet,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """loc focal + shape bounded-IoU + guided-anchor focal/SmoothL1(0.04)
    (``guided_anchor_head.py:641-744`` with the ga_retinanet config:
    ga_assigner 0.5/0.4/0.4, ga_sampler num=256 pos_frac=0.5, assigner
    0.5/0.5/0, center_ratio 0.2, ignore_ratio 0.5)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=GARetinaNet.extract_feat,
        mutable=["batch_stats"])
    cls_s, reg_s, shape_s, loc_s = model.apply(
        variables, feats, method=GARetinaNet.forward_head)

    shapes = ss_fpn_shapes((img_h, img_w))
    squares = jnp.concatenate(_level_squares(shapes), axis=0)   # (A, 4)
    gen_approx = make_retina_anchor_generator()
    approxs = jnp.concatenate(
        [jnp.asarray(a) for a in gen_approx.grid_anchors(shapes)],
        axis=0).reshape(-1, 9, 4)                               # (A, 9, 4)

    c = model.num_classes
    cls_flat = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_s], axis=1)
    reg_flat = jnp.concatenate(
        [s.reshape(b, -1, 4) for s in reg_s], axis=1)
    shape_flat = jnp.concatenate(
        [s.reshape(b, -1, 2) for s in shape_s], axis=1)

    # ------------------------------------------------------------- loc
    def _loc_one(gtb, gtv):
        t, w = ga_loc_targets(gtb, gtv, shapes,
                              center_ratio=model.center_ratio,
                              ignore_ratio=model.ignore_ratio)
        return (jnp.concatenate([x.reshape(-1) for x in t]),
                jnp.concatenate([x.reshape(-1) for x in w]))

    loc_t, loc_w = jax.vmap(_loc_one)(batch["gt_boxes"],
                                      batch["gt_valid"])
    loc_flat = jnp.concatenate(
        [s.reshape(b, -1) for s in loc_s], axis=1).astype(jnp.float32)
    loc_avg = loc_t.size / 200.0
    # binary focal (labels: 1 = fg, 0 = bg in the 1-channel sigmoid form)
    p = jax.nn.sigmoid(loc_flat)
    pt = jnp.where(loc_t > 0, p, 1 - p)
    alpha_t = jnp.where(loc_t > 0, 0.25, 0.75)
    fl = -alpha_t * (1 - pt) ** 2.0 * jnp.log(jnp.clip(pt, 1e-12))
    loss_loc = (fl * loc_w).sum() / loc_avg

    # ----------------------------------------------------------- shape
    k_shape, k_cls = jax.random.split(key)

    def _shape_one(k, sp, gtb, gtv):
        overlaps = approx_max_iou_overlaps(approxs, gtb, gtv)
        assigned = _assign_from_overlaps(overlaps, 0.5, 0.4, 0.4)
        pos = assigned > 0
        noise = jax.random.uniform(k, pos.shape)
        k_pos = 128                      # ga_sampler num=256, pos 0.5
        sc = jnp.where(pos, noise, -1.0)
        top, idx = jax.lax.top_k(sc, k_pos)
        ok = top >= 0
        gt_idx = jnp.clip(assigned[idx] - 1, 0, gtb.shape[0] - 1)
        pred = guided_anchors(squares[idx], sp[idx])
        per = bounded_iou_loss(pred, gtb[gt_idx])
        n_pos = ok.sum()
        total = jnp.maximum(n_pos, 1) + jnp.minimum(
            256 - n_pos, (assigned == 0).sum())
        return (per * ok[:, None]).sum() / total

    loss_shape = jax.vmap(_shape_one)(
        jax.random.split(k_shape, b), shape_flat, batch["gt_boxes"],
        batch["gt_valid"]).mean()

    # --------------------------------------------- cls/reg on guided
    anchors_b = jax.vmap(
        lambda sp: guided_anchors(squares, jax.lax.stop_gradient(sp)))(
        shape_flat)

    def _cls_one(anc, score, delta, gtb, gtl, gtv):
        assigned, _ = max_iou_assign(anc, gtb, gtv, 0.5, 0.5, 0.0)
        is_pos = assigned > 0
        use = assigned >= 0
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], c)
        l_cls = (sigmoid_focal_loss(score, labels, c, cfg.gamma,
                                    cfg.alpha) * use).sum()
        tgt = bbox2delta(anc, gtb[gt_idx])
        l_bbox = (smooth_l1_loss(delta, tgt, beta=0.04).sum(-1)
                  * is_pos).sum()
        return l_cls, l_bbox, is_pos.sum()

    lc, lb, npos = jax.vmap(_cls_one)(
        anchors_b, cls_flat, reg_flat, batch["gt_boxes"],
        batch["gt_labels"], batch["gt_valid"])
    avg = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)

    losses = {"loss_cls": lc.sum() / avg, "loss_bbox": lb.sum() / avg,
              "loss_shape": loss_shape, "loss_loc": loss_loc}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def _assign_from_overlaps(overlaps: jnp.ndarray, pos_thr: float,
                          neg_thr: float, min_pos_iou: float
                          ) -> jnp.ndarray:
    """MaxIoU assignment rules on a precomputed (N, G) overlap matrix
    (incl. gt-max low-quality matching with gt_max_assign_all)."""
    max_o = overlaps.max(axis=1)
    arg_o = overlaps.argmax(axis=1)
    assigned = jnp.full(overlaps.shape[0], -1, jnp.int32)
    assigned = jnp.where((max_o >= 0) & (max_o < neg_thr), 0, assigned)
    assigned = jnp.where(max_o >= pos_thr,
                         arg_o.astype(jnp.int32) + 1, assigned)
    gt_max = overlaps.max(axis=0)
    low = (overlaps == gt_max[None, :]) & (gt_max[None, :] >= min_pos_iou)
    low_gt = jnp.where(low.any(axis=1),
                       low.argmax(axis=1).astype(jnp.int32) + 1, 0)
    assigned = jnp.where(low.any(axis=1), low_gt, assigned)
    return assigned


def ga_retina_simple_test(
    model: GARetinaNet,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Guided anchors + loc-mask score gating + per-level topk + NMS
    (``get_bboxes``, ``guided_anchor_head.py:747-830``)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=GARetinaNet.extract_feat)
    cls_s, reg_s, shape_s, loc_s = model.apply(
        variables, feats, method=GARetinaNet.forward_head)
    shapes = ss_fpn_shapes((img_h, img_w))
    lvl_squares = _level_squares(shapes)

    lvl_boxes, lvl_scores = [], []
    cnum = model.num_classes
    for s, d, sp, lc, sq in zip(cls_s, reg_s, shape_s, loc_s, lvl_squares):
        sc = jax.nn.sigmoid(s.reshape(b, -1, cnum).astype(jnp.float32))
        mask = jax.nn.sigmoid(
            lc.reshape(b, -1).astype(jnp.float32)) >= model.loc_filter_thr
        sc = sc * mask[..., None]
        anc = jax.vmap(lambda spp: guided_anchors(sq, spp))(
            sp.reshape(b, -1, 2).astype(jnp.float32))
        d = d.reshape(b, -1, 4).astype(jnp.float32)
        k = min(cfg.nms_pre, sc.shape[1])
        top_i = jax.lax.top_k(sc.max(-1), k)[1]
        sel_s = jnp.take_along_axis(sc, top_i[..., None], axis=1)
        sel_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        sel_a = jnp.take_along_axis(anc, top_i[..., None], axis=1)
        lvl_boxes.append(delta2bbox(
            sel_a.reshape(-1, 4), sel_d.reshape(-1, 4),
            max_shape=(img_h, img_w)).reshape(b, k, 4))
        lvl_scores.append(sel_s)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)
    if scale_factor is not None:
        boxes = boxes / scale_factor
    pad = jnp.zeros(scores.shape[:2] + (1,), scores.dtype)
    scores_bg = jnp.concatenate([scores, pad], axis=-1)

    def _one(bx, sc):
        return multiclass_nms(bx, sc, cfg.score_thr, cfg.nms_iou,
                              cfg.max_per_img)

    dets, det_scores, labels, valid = jax.vmap(_one)(boxes, scores_bg)
    return {"boxes": dets, "scores": det_scores, "labels": labels,
            "valid": valid}
