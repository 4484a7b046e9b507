"""RepPoints detector (moment transform), static-shape.

Rebuild of the reference RepPoints family
(``mmdet/models/detectors/reppoints_detector.py``, head
``mmdet/models/dense_heads/reppoints_head.py``, assigner
``mmdet/core/bbox/assigners/point_assigner.py``, config
``configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py``): each cell
predicts 9 representation points; the classification and refinement
branches read features THROUGH a deformable conv whose offsets are the
(gradient-attenuated) init points; boxes come from the points' moment
statistics with a learnable width/height transfer. Two-stage targets:
PointAssigner (nearest cell on the gt's scale level) for the init
points, MaxIoU (0.5/0.4) on the init-decoded boxes for cls + refine.

The DCN rides :func:`iif_tpu.ops.deform.deform_conv2d` (batched bilinear
gathers + one MXU contraction) — the TPU replacement for the mmcv
``DeformConv2d`` CUDA op (SURVEY §2.4).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.necks import FPN
from iif_tpu.detection.single_stage import (
    SS_STRIDES,
    SSTestCfg,
    SSTrainCfg,
    _DEPTH_LAYERS,
    _SingleStageBase,
    bias_init_with_prob,
    normal_init,
    ss_fpn_shapes,
)
from iif_tpu.detection.losses import sigmoid_focal_loss
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.deform import deform_conv2d
from iif_tpu.ops.nms import multiclass_nms

NUM_POINTS = 9
POINT_BASE_SCALE = 4
GRADIENT_MUL = 0.1
MOMENT_MUL = 0.01
_INF = 1e8


def points2bbox_moment(pts_xy: jnp.ndarray,       # (..., P, 2) xy
                       moment_transfer: jnp.ndarray,  # (2,) [w, h]
                       moment_mul: float = MOMENT_MUL) -> jnp.ndarray:
    """``reppoints_head.py:169-219`` 'moment': box = mean +- std *
    exp(transfer), the transfer parameter trained with a reduced
    gradient multiplier."""
    mt = (moment_transfer * moment_mul
          + jax.lax.stop_gradient(moment_transfer) * (1 - moment_mul))
    mean = pts_xy.mean(-2)
    std = pts_xy.std(-2, ddof=1)
    half_w = std[..., 0] * jnp.exp(mt[0])
    half_h = std[..., 1] * jnp.exp(mt[1])
    return jnp.stack([mean[..., 0] - half_w, mean[..., 1] - half_h,
                      mean[..., 0] + half_w, mean[..., 1] + half_h], -1)


class RepPointsHead(nn.Module):
    """``reppoints_head.py:125-297``: 3x(conv+GN32+relu) towers;
    init-points conv stack; cls and refine branches through DeformConv
    driven by the init points."""
    num_classes: int
    feat_channels: int = 256
    point_feat_channels: int = 256
    stacked_convs: int = 3
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
        pts_init_conv = nn.Conv(self.point_feat_channels, (3, 3),
                                padding=1, kernel_init=normal_init,
                                name="reppoints_pts_init_conv")
        pts_init_out = nn.Conv(2 * NUM_POINTS, (1, 1),
                               kernel_init=normal_init,
                               name="reppoints_pts_init_out")
        cls_dcn_w = self.param(
            "cls_dcn_kernel", nn.initializers.normal(0.01),
            (3, 3, self.feat_channels, self.point_feat_channels),
            jnp.float32)
        cls_out = nn.Conv(
            self.num_classes, (1, 1), kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="reppoints_cls_out")
        refine_dcn_w = self.param(
            "refine_dcn_kernel", nn.initializers.normal(0.01),
            (3, 3, self.feat_channels, self.point_feat_channels),
            jnp.float32)
        refine_out = nn.Conv(2 * NUM_POINTS, (1, 1),
                             kernel_init=normal_init,
                             name="reppoints_pts_refine_out")
        moment_transfer = self.param("moment_transfer",
                                     nn.initializers.zeros, (2,),
                                     jnp.float32)

        # dcn base offsets: the regular 3x3 grid, (y, x) pairs
        base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1],
                                    indexing="ij"), -1).reshape(9, 2)
        base = jnp.asarray(base, jnp.float32)

        cls_scores, pts_inits, pts_refines = [], [], []
        for x in feats:
            c = r = x
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            r32 = r.astype(jnp.float32)
            pts_init = pts_init_out(
                nn.relu(pts_init_conv(r))).astype(jnp.float32)
            # gradient_mul: attenuate init-point gradients through the DCN
            pts_gm = ((1 - GRADIENT_MUL) * jax.lax.stop_gradient(pts_init)
                      + GRADIENT_MUL * pts_init)
            b, fh, fw, _ = pts_init.shape
            dcn_off = pts_gm.reshape(b, fh, fw, NUM_POINTS, 2) - base
            cls_feat = nn.relu(deform_conv2d(
                c.astype(jnp.float32), dcn_off, cls_dcn_w))
            cls_scores.append(cls_out(cls_feat))
            ref_feat = nn.relu(deform_conv2d(r32, dcn_off, refine_dcn_w))
            pts_refine = refine_out(ref_feat) \
                + jax.lax.stop_gradient(pts_init)
            pts_inits.append(pts_init)
            pts_refines.append(pts_refine)
        return cls_scores, pts_inits, pts_refines, moment_transfer


class RepPoints(_SingleStageBase):
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
        self.head = RepPointsHead(self.num_classes,
                                  dtype=self.compute_dtype,
                                  name="bbox_head")


def point_assign(points_xy: jnp.ndarray,     # (N, 2)
                 points_lvl: jnp.ndarray,    # (N,) int log2(stride)
                 gt_boxes: jnp.ndarray,      # (G, 4)
                 gt_valid: jnp.ndarray,      # (G,)
                 scale: float = 4.0,
                 lvl_min: int = 3, lvl_max: int = 7) -> jnp.ndarray:
    """``point_assigner.py:30-135`` with pos_num=1: each gt claims the
    nearest (wh-normalized) point on its scale level; a point claimed by
    several gts keeps the closest (earlier gt wins ties — the reference
    overwrites only on strictly smaller distance). Returns (N,) int32
    0=bg / i+1."""
    n, g = points_xy.shape[0], gt_boxes.shape[0]
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    gw = jnp.clip(gt_boxes[:, 2] - gt_boxes[:, 0], 1e-6)
    gh = jnp.clip(gt_boxes[:, 3] - gt_boxes[:, 1], 1e-6)
    gt_lvl = jnp.clip(((jnp.log2(gw / scale) + jnp.log2(gh / scale))
                       / 2).astype(jnp.int32), lvl_min, lvl_max)

    assigned = jnp.zeros(n, jnp.int32)
    best_dist = jnp.full(n, jnp.inf)
    for i in range(g):
        d = jnp.sqrt(((points_xy[:, 0] - gcx[i]) / gw[i]) ** 2
                     + ((points_xy[:, 1] - gcy[i]) / gh[i]) ** 2)
        d = jnp.where(points_lvl == gt_lvl[i], d, jnp.inf)
        idx = jnp.argmin(d)
        take = gt_valid[i] & (d[idx] < best_dist[idx])
        assigned = assigned.at[idx].set(
            jnp.where(take, i + 1, assigned[idx]))
        best_dist = best_dist.at[idx].set(
            jnp.where(take, d[idx], best_dist[idx]))
    return assigned


def _grid_centers(shapes, strides):
    pts, lvls, strs = [], [], []
    for (fh, fw), s in zip(shapes, strides):
        xs = np.arange(fw, dtype=np.float32) * s + s // 2
        ys = np.arange(fh, dtype=np.float32) * s + s // 2
        xx, yy = np.meshgrid(xs, ys)
        pts.append(np.stack([xx.ravel(), yy.ravel()], -1))
        lvls.append(np.full(fh * fw, int(np.log2(s)), np.int32))
        strs.append(np.full(fh * fw, s, np.float32))
    return (np.concatenate(pts).astype(np.float32), np.concatenate(lvls),
            np.concatenate(strs))


def _abs_points(centers: jnp.ndarray,     # (N, 2) xy
                offsets: jnp.ndarray,     # (N, 2P) y-first pairs
                strides: jnp.ndarray) -> jnp.ndarray:   # (N, P, 2) xy
    """``offset_to_pts``: absolute point coords = center + offset*stride,
    converting the head's y-first pairs to xy."""
    off = offsets.reshape(offsets.shape[0], -1, 2)
    xy = jnp.stack([off[..., 1], off[..., 0]], -1)
    return centers[:, None, :] + xy * strides[:, None, None]


def _smooth_l1(pred, tgt, beta=0.11):
    diff = jnp.abs(pred - tgt)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


def reppoints_loss(
    model: RepPoints,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``reppoints_head.py:520-651``: focal cls on refine-stage MaxIoU
    labels / num_pos_refine; smooth-L1 (beta .11) on moment-decoded
    boxes normalized by 4*stride — init stage weight 0.5 on
    PointAssigner positives, refine stage weight 1.0."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=RepPoints.extract_feat,
        mutable=["batch_stats"])
    cls_scores, pts_inits, pts_refines, mt = model.apply(
        variables, feats, method=RepPoints.forward_head)

    shapes = ss_fpn_shapes((img_h, img_w))
    centers_np, lvls_np, strs_np = _grid_centers(shapes, SS_STRIDES)
    centers = jnp.asarray(centers_np)
    lvls = jnp.asarray(lvls_np)
    strides = jnp.asarray(strs_np)
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    off_init = jnp.concatenate(
        [p.reshape(b, -1, 2 * NUM_POINTS) for p in pts_inits], axis=1)
    off_refine = jnp.concatenate(
        [p.reshape(b, -1, 2 * NUM_POINTS) for p in pts_refines], axis=1)
    norm_term = POINT_BASE_SCALE * strides

    def _one(score, oi, orf, gtb, gtl, gtv):
        pts_i = _abs_points(centers, oi, strides)
        pts_r = _abs_points(centers, orf, strides)
        box_i = points2bbox_moment(pts_i, mt)
        box_r = points2bbox_moment(pts_r, mt)

        # init stage: PointAssigner
        a_init = point_assign(centers, lvls, gtb, gtv)
        pos_i = a_init > 0
        gt_i = jnp.clip(a_init - 1, 0, gtb.shape[0] - 1)
        li = (_smooth_l1(box_i / norm_term[:, None],
                         gtb[gt_i] / norm_term[:, None]).sum(-1)
              * pos_i).sum() * 0.5

        # refine stage: MaxIoU on detached init boxes
        a_ref, _ = max_iou_assign(
            jax.lax.stop_gradient(box_i), gtb, gtv, 0.5, 0.4, 0.0)
        pos_r = a_ref > 0
        gt_r = jnp.clip(a_ref - 1, 0, gtb.shape[0] - 1)
        labels = jnp.where(pos_r, gtl[gt_r], c)
        l_cls = (sigmoid_focal_loss(score, labels, c, cfg.gamma,
                                    cfg.alpha)
                 * (a_ref >= 0)).sum()
        lr = (_smooth_l1(box_r / norm_term[:, None],
                         gtb[gt_r] / norm_term[:, None]).sum(-1)
              * pos_r).sum()
        return l_cls, li, lr, pos_i.sum(), pos_r.sum()

    lc, li, lr, ni, nr = jax.vmap(_one)(
        scores.astype(jnp.float32), off_init, off_refine,
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    n_i = jnp.maximum(ni.sum().astype(jnp.float32), 1.0)
    n_r = jnp.maximum(nr.sum().astype(jnp.float32), 1.0)
    losses = {"loss_cls": lc.sum() / n_r,
              "loss_pts_init": li.sum() / n_i,
              "loss_pts_refine": lr.sum() / n_r}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def reppoints_simple_test(
    model: RepPoints,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``reppoints_head.py:653-760``: refine points -> moment boxes,
    clamp to image, multiclass NMS."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=RepPoints.extract_feat)
    cls_scores, _, pts_refines, mt = model.apply(
        variables, feats, method=RepPoints.forward_head)
    shapes = ss_fpn_shapes((img_h, img_w))
    centers_np, _, strs_np = _grid_centers(shapes, SS_STRIDES)
    c = model.num_classes

    lvl_boxes, lvl_scores = [], []
    start = 0
    for s, p, (fh, fw), stride in zip(cls_scores, pts_refines, shapes,
                                      SS_STRIDES):
        n_l = fh * fw
        ctr = jnp.asarray(centers_np[start:start + n_l])
        strv = jnp.asarray(strs_np[start:start + n_l])
        start += n_l
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        off = p.reshape(b, -1, 2 * NUM_POINTS).astype(jnp.float32)
        pts = jax.vmap(lambda o: _abs_points(ctr, o, strv))(off)
        boxes = points2bbox_moment(pts, mt)
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, img_w),
            jnp.clip(boxes[..., 1], 0, img_h),
            jnp.clip(boxes[..., 2], 0, img_w),
            jnp.clip(boxes[..., 3], 0, img_h)], -1)
        k = min(cfg.nms_pre, s.shape[1])
        top_i = jax.lax.top_k(s.max(-1), k)[1]
        lvl_scores.append(jnp.take_along_axis(s, top_i[..., None], axis=1))
        lvl_boxes.append(jnp.take_along_axis(boxes, top_i[..., None],
                                             axis=1))

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
