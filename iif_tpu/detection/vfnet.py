"""VFNet detector (VarifocalNet), static-shape.

Rebuild of the reference VFNet family
(``mmdet/models/detectors/vfnet.py``, head
``mmdet/models/dense_heads/vfnet_head.py``, loss
``mmdet/models/losses/varifocal_loss.py``, config
``configs/vfnet/vfnet_r50_fpn_1x_coco.py``): FCOS-style towers; an
initial ltrb prediction (exp, normalized by the level's reg_denom)
shapes a 9-point STAR deformable conv whose sampled features refine the
box (multiplicative residual) and produce the IoU-aware classification
score trained with Varifocal Loss; assignment is ATSS (use_atss=True);
both GIoU losses are weighted by the detached prediction-gt IoU.

The star DCNs ride :func:`iif_tpu.ops.deform.deform_conv2d`.
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
from iif_tpu.ops.deform import deform_conv2d
from iif_tpu.ops.nms import multiclass_nms

# regress_ranges upper bounds; the last doubles (vfnet_head.py __init__)
REG_DENOMS = (64, 128, 256, 512, 1024)
GRADIENT_MUL = 0.1


def varifocal_loss(pred: jnp.ndarray,      # (N, C) logits
                   target: jnp.ndarray,    # (N, C) iou-aware targets
                   alpha: float = 0.75, gamma: float = 2.0) -> jnp.ndarray:
    """``varifocal_loss.py`` (iou_weighted=True): positives weighted by
    the target IoU, negatives by alpha*|p - q|^gamma. Returns (N, C)."""
    p = jax.nn.sigmoid(pred)
    focal_w = (target * (target > 0)
               + alpha * jnp.abs(p - target) ** gamma * (target <= 0))
    bce = (jnp.maximum(pred, 0) - pred * target
           + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    return bce * focal_w


def star_dcn_offsets(ltrb: jnp.ndarray,    # (B, H, W, 4) (l, t, r, b) px
                     stride: int,
                     gradient_mul: float = GRADIENT_MUL) -> jnp.ndarray:
    """``vfnet_head.py:274-313``: place the 9 DCN taps on the predicted
    box's star points (corners, side midpoints, center), expressed as
    offsets from the regular 3x3 grid. Returns (B, H, W, 9, 2) (dy, dx).

    NOTE the reference's (x1, y1, x2, y2) here are the (l, t, r, b)
    distances; tap layout (y-major 3x3 grid):
        (-t,-l) (-t, 0) (-t, r)
        ( 0,-l) ( 0, 0) ( 0, r)
        ( b,-l) ( b, 0) ( b, r)
    """
    g = ((1 - gradient_mul) * jax.lax.stop_gradient(ltrb)
         + gradient_mul * ltrb) / stride
    l, t, r, b = g[..., 0], g[..., 1], g[..., 2], g[..., 3]
    zero = jnp.zeros_like(l)
    ys = jnp.stack([-t, -t, -t, zero, zero, zero, b, b, b], -1)
    xs = jnp.stack([-l, zero, r, -l, zero, r, -l, zero, r], -1)
    star = jnp.stack([ys, xs], -1)                     # (B, H, W, 9, 2)
    base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), -1).reshape(9, 2)
    return star - jnp.asarray(base, jnp.float32)


class VFNetHead(nn.Module):
    """``vfnet_head.py:159-272``: 3x(conv+GN32+relu) towers, initial reg
    conv+scale+exp*reg_denom, star-DCN refine and cls branches."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 3
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
        reg_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                           kernel_init=normal_init, dtype=self.dtype,
                           name="vfnet_reg_conv")
        reg_gn = nn.GroupNorm(num_groups=32, name="vfnet_reg_gn")
        vfnet_reg = nn.Conv(4, (3, 3), padding=1, kernel_init=normal_init,
                            name="vfnet_reg")
        refine_dcn_w = self.param(
            "refine_dcn_kernel", nn.initializers.normal(0.01),
            (3, 3, self.feat_channels, self.feat_channels), jnp.float32)
        refine_gn = nn.GroupNorm(num_groups=32, name="vfnet_refine_gn")
        vfnet_reg_refine = nn.Conv(4, (3, 3), padding=1,
                                   kernel_init=normal_init,
                                   name="vfnet_reg_refine")
        cls_dcn_w = self.param(
            "cls_dcn_kernel", nn.initializers.normal(0.01),
            (3, 3, self.feat_channels, self.feat_channels), jnp.float32)
        cls_gn = nn.GroupNorm(num_groups=32, name="vfnet_cls_gn")
        vfnet_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="vfnet_cls")
        scales = [self.param(f"scale_{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]
        scales_refine = [
            self.param(f"scale_refine_{i}", nn.initializers.ones, ())
            for i in range(self.num_levels)]

        cls_scores, bbox_preds, bbox_refines = [], [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            reg_init = nn.relu(reg_gn(reg_conv(r)))
            pred = jnp.exp(vfnet_reg(reg_init).astype(jnp.float32)
                           * scales[lvl]) * REG_DENOMS[lvl]
            dcn_off = star_dcn_offsets(pred, SS_STRIDES[lvl])
            r32 = r.astype(jnp.float32)
            ref_feat = nn.relu(refine_gn(
                deform_conv2d(r32, dcn_off, refine_dcn_w)))
            refine = jnp.exp(
                vfnet_reg_refine(ref_feat).astype(jnp.float32)
                * scales_refine[lvl]) * jax.lax.stop_gradient(pred)
            cls_feat = nn.relu(cls_gn(
                deform_conv2d(c.astype(jnp.float32), dcn_off, cls_dcn_w)))
            cls_scores.append(vfnet_cls(cls_feat))
            bbox_preds.append(pred)
            bbox_refines.append(refine)
        return cls_scores, bbox_preds, bbox_refines


class VFNet(_SingleStageBase):
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
        self.head = VFNetHead(self.num_classes, dtype=self.compute_dtype,
                              name="bbox_head")


def vfnet_loss(
    model: VFNet,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``vfnet_head.py:316-463``: ATSS assignment; GIoU*1.5 on the
    initial boxes / GIoU*2.0 on the refined boxes, weighted by the
    detached IoU and normalized by the batch weight sums; Varifocal cls
    with refined-IoU targets / num_pos."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=VFNet.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds, bbox_refines = model.apply(
        variables, feats, method=VFNet.forward_head)

    gen = make_atss_anchor_generator()
    shapes = ss_fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    level_sizes = [fh * fw for fh, fw in shapes]
    points = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                        (anchors[:, 1] + anchors[:, 3]) * 0.5], -1)
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    preds = jnp.concatenate(
        [p.reshape(b, -1, 4) for p in bbox_preds], axis=1)
    refines = jnp.concatenate(
        [p.reshape(b, -1, 4) for p in bbox_refines], axis=1)

    def _one(score, pred, refine, gtb, gtl, gtv):
        assigned = atss_assign(anchors, level_sizes, gtb, gtv)
        is_pos = (assigned > 0).astype(jnp.float32)
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        labels = jnp.where(assigned > 0, gtl[gt_idx], c)
        tgt = gtb[gt_idx]

        box_i = distance2bbox(points, pred)
        box_r = distance2bbox(points, refine)
        iou_i = jnp.clip(1.0 - iou_loss(
            jax.lax.stop_gradient(box_i), tgt, "linear"), 1e-6) * is_pos
        iou_r = jnp.clip(1.0 - iou_loss(
            jax.lax.stop_gradient(box_r), tgt, "linear"), 1e-6) * is_pos

        l_bbox = (iou_loss(box_i, tgt, "giou") * iou_i).sum() * 1.5
        l_rf = (iou_loss(box_r, tgt, "giou") * iou_r).sum() * 2.0

        # iou-aware cls targets: refined IoU at the gt-label column
        cls_tgt = (jax.nn.one_hot(labels, c, dtype=jnp.float32)
                   * iou_r[:, None])
        l_cls = varifocal_loss(score, cls_tgt).sum()
        return l_cls, l_bbox, l_rf, is_pos.sum(), iou_i.sum(), iou_r.sum()

    lc, lb, lrf, npos, wi, wr = jax.vmap(_one)(
        scores.astype(jnp.float32), preds, refines,
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    n = jnp.maximum(npos.sum(), 1.0)
    losses = {"loss_cls": lc.sum() / n,
              "loss_bbox": lb.sum() / jnp.maximum(wi.sum(), 1.0),
              "loss_bbox_rf": lrf.sum() / jnp.maximum(wr.sum(), 1.0)}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def vfnet_simple_test(
    model: VFNet,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``vfnet_head.py:464-596``: sigmoid IoU-aware scores, refined
    distance decode, multiclass NMS (no extra score factors — the score
    already carries localization quality)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=VFNet.extract_feat)
    cls_scores, _, bbox_refines = model.apply(
        variables, feats, method=VFNet.forward_head)
    c = model.num_classes

    lvl_boxes, lvl_scores = [], []
    for lvl, (s, p) in enumerate(zip(cls_scores, bbox_refines)):
        fh, fw = s.shape[1:3]
        stride = SS_STRIDES[lvl]
        xs = (jnp.arange(fw, dtype=jnp.float32) * stride) + stride / 2.0
        ys = (jnp.arange(fh, dtype=jnp.float32) * stride) + stride / 2.0
        xx, yy = jnp.meshgrid(xs, ys)
        pts = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        p = p.reshape(b, -1, 4)
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
