"""AutoAssign detector, static-shape.

Rebuild of the reference AutoAssign family
(``mmdet/models/detectors/autoassign.py``, head
``mmdet/models/dense_heads/autoassign_head.py``, config
``configs/autoassign/autoassign_r50_fpn_8x2_1x_coco.py``): an FCOS-style
head (cls + implicit objectness + relu'd stride-scaled ltrb) with fully
differentiable assignment — a learnable per-class CENTER PRIOR Gaussian
(mean/sigma over normalized offsets) weights a confidence-softmax
positive loss per gt (w = e^{3 p_pos} * prior, normalized over points),
an IoU-shaped negative down-weighting inside gt boxes, and a center
loss pushing the priors to cover each gt.
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

EPS = 1e-12
POS_W, NEG_W, CENTER_W = 0.25, 0.75, 0.75


class AutoAssignHead(nn.Module):
    """FCOS towers + cls (bias prior 0.02), relu'd reg * stride,
    objectness on the reg tower, plus the CenterPrior parameters."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        def tower(prefix):
            return [(nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init, dtype=self.dtype,
                             name=f"{prefix}_conv_{i}"),
                     nn.GroupNorm(num_groups=32, name=f"{prefix}_gn_{i}"))
                    for i in range(self.stacked_convs)]

        cls_tower = tower("cls")
        reg_tower = tower("reg")
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.02)),
            name="conv_cls")
        conv_reg = nn.Conv(
            4, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(4.0),   # init_weights: 4.0
            name="conv_reg")
        conv_obj = nn.Conv(1, (3, 3), padding=1, kernel_init=normal_init,
                           name="conv_centerness")
        scales = [self.param(f"scale_{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]
        prior_mean = self.param("center_prior_mean",
                                nn.initializers.zeros,
                                (self.num_classes, 2))
        prior_sigma = self.param("center_prior_sigma",
                                 nn.initializers.ones,
                                 (self.num_classes, 2))
        cls_scores, bbox_preds, objs = [], [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            cls_scores.append(conv_cls(c))
            reg = nn.relu(conv_reg(r).astype(jnp.float32) * scales[lvl])
            bbox_preds.append(reg * SS_STRIDES[lvl])
            objs.append(conv_obj(r))
        return cls_scores, bbox_preds, objs, prior_mean, prior_sigma


class AutoAssign(_SingleStageBase):
    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs="on_output",
                        relu_before_extra_convs=True,
                        dtype=self.compute_dtype, name="neck")
        self.head = AutoAssignHead(self.num_classes,
                                   dtype=self.compute_dtype,
                                   name="bbox_head")


def _points_strides(img_hw):
    pts, strs = [], []
    for (fh, fw), s in zip(ss_fpn_shapes(img_hw), SS_STRIDES):
        xs = np.arange(fw, dtype=np.float32) * s + s // 2
        ys = np.arange(fh, dtype=np.float32) * s + s // 2
        xx, yy = np.meshgrid(xs, ys)
        pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
        strs.append(np.full(fh * fw, s, np.float32))
    return np.concatenate(pts), np.concatenate(strs)


def autoassign_loss(
    model: AutoAssign,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``autoassign_head.py:216-444``."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=AutoAssign.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds, objs, pmean, psigma = model.apply(
        variables, feats, method=AutoAssign.forward_head)
    pts_np, strs_np = _points_strides((img_h, img_w))
    points = jnp.asarray(pts_np)
    strides = jnp.asarray(strs_np)
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    preds = jnp.concatenate(
        [p.reshape(b, -1, 4) for p in bbox_preds], axis=1)
    objness = jnp.concatenate(
        [o.reshape(b, -1) for o in objs], axis=1)
    g = batch["gt_boxes"].shape[1]

    def _one(score, pred, obj, gtb, gtl, gtv):
        px, py = points[:, 0:1], points[:, 1:2]
        l = px - gtb[None, :, 0]
        t = py - gtb[None, :, 1]
        r = gtb[None, :, 2] - px
        bm = gtb[None, :, 3] - py
        inside = (jnp.stack([l, t, r, bm], -1).min(-1) > 0) \
            & gtv[None, :]                               # (P, G)

        # learnable center prior (CenterPrior.forward)
        gcx = (gtb[:, 0] + gtb[:, 2]) / 2
        gcy = (gtb[:, 1] + gtb[:, 3]) / 2
        lbl = jnp.clip(gtl, 0, c - 1)
        mu = pmean[lbl]                                  # (G, 2)
        sg = psigma[lbl]
        dx = ((points[:, None, 0] - gcx[None]) / strides[:, None]
              - mu[None, :, 0]) ** 2
        dy = ((points[:, None, 1] - gcy[None]) / strides[:, None]
              - mu[None, :, 1]) ** 2
        prior = (jnp.exp(-dx / (2 * sg[None, :, 0] ** 2))
                 * jnp.exp(-dy / (2 * sg[None, :, 1] ** 2)))
        prior = jnp.where(inside, prior, 0.0)            # (P, G)

        decoded = distance2bbox(points, pred)            # (P, 4)
        giou = jax.vmap(
            lambda gb: iou_loss(decoded, jnp.broadcast_to(
                gb[None], decoded.shape), "giou"), out_axes=1)(gtb)
        reg_loss = 5.0 * giou * inside                   # (P, G)

        # plain IoU (aligned), max over gts then broadcast, 0 outside
        iou_al = 1.0 - jax.lax.stop_gradient(
            jax.vmap(lambda gb: iou_loss(
                decoded, jnp.broadcast_to(gb[None], decoded.shape),
                "linear"), out_axes=1)(gtb))
        iou_max = jnp.where(gtv[None, :], iou_al, 0.0).max(
            -1, keepdims=True)
        ious = jnp.where(inside, jnp.broadcast_to(iou_max, iou_al.shape),
                         0.0)

        p_cls_all = jax.nn.sigmoid(score.astype(jnp.float32)) \
            * jax.nn.sigmoid(obj.astype(jnp.float32))[:, None]
        p_cls = p_cls_all[:, lbl]                        # (P, G)
        p_loc = jnp.exp(-reg_loss)
        p_pos = p_cls * p_loc
        w = jnp.exp(p_pos * 3.0) * prior
        w = w / jnp.clip(w.sum(0, keepdims=True), EPS)
        rew = (p_pos * w).sum(0)                         # (G,)
        pos_bce = -jnp.log(jnp.clip(rew, EPS, 1.0))
        l_pos = (pos_bce * gtv).sum() * POS_W

        # negative weights: 1 - minmax-normalized 1/(1-iou) per gt,
        # written gt-by-gt (later gt wins, the reference's write order)
        neg_w = jnp.ones((points.shape[0], c), jnp.float32)
        for gi in range(g):
            m = inside[:, gi]
            tw = 1.0 / jnp.clip(1.0 - ious[:, gi], EPS)
            tmin = jnp.where(m, tw, jnp.inf).min()
            tmax = jnp.where(m, tw, -jnp.inf).max()
            norm = (tw - tmin + EPS) / (tmax - tmin + EPS)
            col = jax.nn.one_hot(lbl[gi], c, dtype=bool)[None, :] \
                & m[:, None] & gtv[gi]
            neg_w = jnp.where(col, 1.0 - norm[:, None], neg_w)
        logits = p_cls_all * neg_w
        neg_bce = -jnp.log(jnp.clip(1.0 - logits, EPS, 1.0))
        l_neg = (logits ** 2 * neg_bce).sum() * NEG_W

        prior_sum = prior.sum()
        any_inside = inside.any()
        l_center = jnp.where(
            any_inside, gtv.sum() / jnp.clip(prior_sum, EPS),
            prior_sum * 0.0)
        return l_pos, l_neg, l_center, gtv.sum(), prior_sum

    lp, ln, lctr, ngt, psum = jax.vmap(_one)(
        scores, preds, objness, batch["gt_boxes"], batch["gt_labels"],
        batch["gt_valid"])
    n_gt = jnp.maximum(ngt.sum(), 1.0)
    n_prior = jnp.maximum(psum.sum(), 1.0)
    losses = {"loss_pos": lp.sum() / n_gt,
              "loss_neg": ln.sum() / n_prior,
              "loss_center": lctr.mean() * CENTER_W}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def autoassign_simple_test(
    model: AutoAssign,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """FCOS-style get_bboxes with objectness as the score factor."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=AutoAssign.extract_feat)
    cls_scores, bbox_preds, objs, _, _ = model.apply(
        variables, feats, method=AutoAssign.forward_head)
    c = model.num_classes

    lvl_boxes, lvl_scores = [], []
    for lvl, (s, p, o) in enumerate(zip(cls_scores, bbox_preds, objs)):
        fh, fw = s.shape[1:3]
        stride = SS_STRIDES[lvl]
        xs = (jnp.arange(fw, dtype=jnp.float32) * stride) + stride // 2
        ys = (jnp.arange(fh, dtype=jnp.float32) * stride) + stride // 2
        xx, yy = jnp.meshgrid(xs, ys)
        pts = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        o = jax.nn.sigmoid(o.reshape(b, -1).astype(jnp.float32))
        s = s * o[..., None]
        p = p.reshape(b, -1, 4).astype(jnp.float32)
        k = min(cfg.nms_pre, s.shape[1])
        top_i = jax.lax.top_k(s.max(-1), k)[1]
        sel_s = jnp.take_along_axis(s, top_i[..., None], axis=1)
        sel_p = jnp.take_along_axis(p, top_i[..., None], axis=1)
        sel_pts = jnp.take_along_axis(
            jnp.broadcast_to(pts[None], (b,) + pts.shape),
            top_i[..., None], axis=1)
        lvl_boxes.append(distance2bbox(sel_pts, sel_p, (img_h, img_w)))
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
