"""FoveaBox detector, static-shape.

Rebuild of the reference FoveaBox family
(``mmdet/models/detectors/fovea.py``, head
``mmdet/models/dense_heads/fovea_head.py``, config
``configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py``): anchor-free; each
pyramid level owns gts whose sqrt(area) falls in its scale range; cells
inside the sigma-shrunk "fovea" of a gt are positive (smallest gt wins);
box targets are log((stride*cell +- gt side) / base_edge) clamped to
[1/16, 16]; focal cls (gamma 1.5, alpha 0.4, avg num_pos + num_imgs) +
smooth-L1 (beta 0.11) on positives.

TPU-first: the reference's per-gt python region-painting loop
(``fovea_head.py:207-266``) becomes a (cells, G) coverage matrix with a
min-area argmin per cell — identical to the descending-area overwrite
order — unrolled over the five static level shapes.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

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
from iif_tpu.detection.losses import sigmoid_focal_loss
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.nms import multiclass_nms

BASE_EDGES = (16, 32, 64, 128, 256)
SCALE_RANGES = ((8, 32), (16, 64), (32, 128), (64, 256), (128, 512))
SIGMA = 0.4
_INF = 1e8


class FoveaHead(RetinaHead):
    """Retina-style towers with one point per cell; reg is exp-decoded at
    inference (``fovea_head.py:78-130``, with_deform=False)."""

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
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1, kernel_init=normal_init,
                           name="conv_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            c = r = x
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_scores.append(conv_cls(c))
            bbox_preds.append(conv_reg(r))
        return cls_scores, bbox_preds


class FoveaBox(_SingleStageBase):
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
        self.head = FoveaHead(self.num_classes, num_anchors=1,
                              dtype=self.compute_dtype, name="bbox_head")


def fovea_targets_level(
    fh: int, fw: int, stride: int, base_len: int,
    scale_range: Tuple[float, float],
    gt_boxes: jnp.ndarray,    # (G, 4)
    gt_labels: jnp.ndarray,   # (G,)
    gt_valid: jnp.ndarray,    # (G,)
    num_classes: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One level's (labels (fh*fw,), log bbox targets (fh*fw, 4)) —
    ``fovea_head.py:207-266`` vectorized."""
    areas = jnp.sqrt(jnp.clip(
        (gt_boxes[:, 2] - gt_boxes[:, 0])
        * (gt_boxes[:, 3] - gt_boxes[:, 1]), 0.0))
    hit = (areas >= scale_range[0]) & (areas <= scale_range[1]) & gt_valid

    gb = gt_boxes / stride
    half_w = 0.5 * (gb[:, 2] - gb[:, 0])
    half_h = 0.5 * (gb[:, 3] - gb[:, 1])
    pos_l = jnp.clip(jnp.ceil(
        gb[:, 0] + (1 - SIGMA) * half_w - 0.5), 0, fw - 1).astype(jnp.int32)
    pos_r = jnp.clip(jnp.floor(
        gb[:, 0] + (1 + SIGMA) * half_w - 0.5), 0, fw - 1).astype(jnp.int32)
    pos_t = jnp.clip(jnp.ceil(
        gb[:, 1] + (1 - SIGMA) * half_h - 0.5), 0, fh - 1).astype(jnp.int32)
    pos_d = jnp.clip(jnp.floor(
        gb[:, 1] + (1 + SIGMA) * half_h - 0.5), 0, fh - 1).astype(jnp.int32)

    ys = jnp.arange(fh)
    xs = jnp.arange(fw)
    in_y = (ys[:, None] >= pos_t[None]) & (ys[:, None] <= pos_d[None])
    in_x = (xs[:, None] >= pos_l[None]) & (xs[:, None] <= pos_r[None])
    cover = (in_y[:, None, :] & in_x[None, :, :]) & hit[None, None, :]
    cover = cover.reshape(fh * fw, -1)                       # (P, G)

    raw_area = areas ** 2
    masked = jnp.where(cover, raw_area[None, :], _INF)
    best = masked.argmin(-1)
    is_pos = masked.min(-1) < _INF * 0.5
    labels = jnp.where(is_pos, gt_labels[best], num_classes)

    # grid point centers (cell + 0.5) in image coords via stride*x
    yy, xx = jnp.meshgrid(ys.astype(jnp.float32) + 0.5,
                          xs.astype(jnp.float32) + 0.5, indexing="ij")
    px = (stride * xx).reshape(-1)
    py = (stride * yy).reshape(-1)
    g = gt_boxes[best]                                       # (P, 4)
    t = jnp.stack([(px - g[:, 0]) / base_len,
                   (py - g[:, 1]) / base_len,
                   (g[:, 2] - px) / base_len,
                   (g[:, 3] - py) / base_len], -1)
    t = jnp.where(is_pos[:, None], t, 1.0)
    t = jnp.clip(t, 1.0 / 16, 16.0)
    return labels, jnp.log(t)


def fovea_loss(
    model: FoveaBox,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``fovea_head.py:135-184``: focal (gamma 1.5, alpha 0.4) /
    (num_pos + num_imgs) + smooth-L1 (beta 0.11) / num_pos."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=FoveaBox.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=FoveaBox.forward_head)
    shapes = ss_fpn_shapes((img_h, img_w))
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    preds = jnp.concatenate(
        [p.reshape(b, -1, 4) for p in bbox_preds], axis=1)

    def _one(score, pred, gtb, gtl, gtv):
        labels_l, tgts_l = [], []
        for (fh, fw), stride, base, rng in zip(shapes, SS_STRIDES,
                                               BASE_EDGES, SCALE_RANGES):
            lab, tgt = fovea_targets_level(fh, fw, stride, base, rng,
                                           gtb, gtl, gtv, c)
            labels_l.append(lab)
            tgts_l.append(tgt)
        labels = jnp.concatenate(labels_l)
        tgts = jnp.concatenate(tgts_l, axis=0)
        is_pos = labels < c
        l_cls = sigmoid_focal_loss(score, labels, c, gamma=1.5,
                                   alpha=0.4).sum()
        # smooth L1, beta 0.11, summed over the 4 dims of positives
        diff = jnp.abs(pred - tgts)
        beta = 0.11
        sl1 = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                        diff - 0.5 * beta).sum(-1)
        l_bbox = (sl1 * is_pos).sum()
        return l_cls, l_bbox, is_pos.sum()

    lc, lb, npos = jax.vmap(_one)(
        scores.astype(jnp.float32), preds.astype(jnp.float32),
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    n_pos = npos.sum().astype(jnp.float32)
    losses = {"loss_cls": lc.sum() / (n_pos + b),
              "loss_bbox": lb.sum() / jnp.maximum(n_pos, 1.0)}
    total = losses["loss_cls"] + losses["loss_bbox"]
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def fovea_simple_test(
    model: FoveaBox,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``fovea_head.py:299-352``: exp(pred)*base_edge offsets from
    stride*(cell+0.5) centers, clamp to image, multiclass NMS."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=FoveaBox.extract_feat)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=FoveaBox.forward_head)
    c = model.num_classes

    lvl_boxes, lvl_scores = [], []
    for s, p, stride, base in zip(cls_scores, bbox_preds, SS_STRIDES,
                                  BASE_EDGES):
        fh, fw = s.shape[1:3]
        yy, xx = jnp.meshgrid(
            jnp.arange(fh, dtype=jnp.float32) + 0.5,
            jnp.arange(fw, dtype=jnp.float32) + 0.5, indexing="ij")
        px = (stride * xx).reshape(-1)
        py = (stride * yy).reshape(-1)
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        p = jnp.exp(p.reshape(b, -1, 4).astype(jnp.float32))
        k = min(cfg.nms_pre, s.shape[1])
        top_i = jax.lax.top_k(s.max(-1), k)[1]
        sel_s = jnp.take_along_axis(s, top_i[..., None], axis=1)
        sel_p = jnp.take_along_axis(p, top_i[..., None], axis=1)
        sel_px = jnp.take_along_axis(
            jnp.broadcast_to(px[None], (b,) + px.shape), top_i, axis=1)
        sel_py = jnp.take_along_axis(
            jnp.broadcast_to(py[None], (b,) + py.shape), top_i, axis=1)
        x1 = jnp.clip(sel_px - base * sel_p[..., 0], 0, img_w - 1)
        y1 = jnp.clip(sel_py - base * sel_p[..., 1], 0, img_h - 1)
        x2 = jnp.clip(sel_px + base * sel_p[..., 2], 0, img_w - 1)
        y2 = jnp.clip(sel_py + base * sel_p[..., 3], 0, img_h - 1)
        lvl_boxes.append(jnp.stack([x1, y1, x2, y2], -1))
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
