"""YOLACT, static-shape.

Rebuild of the reference YOLACT family
(``mmdet/models/detectors/yolact.py``, heads
``mmdet/models/dense_heads/yolact_head.py``: YOLACTHead /
YOLACTSegmHead / YOLACTProtonet, config
``configs/yolact/yolact_r50_1x8_coco.py``): an SSD-style anchor head
(softmax CE with 3:1 OHEM, smooth-L1 * 1.5) that also predicts 32
tanh mask COEFFICIENTS per anchor; a PROTONET on P3 producing 32
image-sized prototype masks; instance masks = sigmoid(protos @ coeffs)
cropped to the box, BCE against the downsampled gt masks weighted by
1/box-area (* 6.125); an auxiliary per-class semantic head on P3
(sigmoid BCE); and FAST NMS at inference (the op this repo already
ships, ``ops/nms.py fast_nms``).

Deviation noted for parity review: anchors use strides (8..128) from
the feature grid rather than the reference's 550-px-specific fractional
strides, and the detection masks are emitted as per-box 28x28 crops of
the prototype composite so they flow through the shared paste pipeline.
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
    normal_init,
    ss_fpn_shapes,
)
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.deform import bilinear_sample_batched
from iif_tpu.ops.nms import fast_nms

NUM_PROTOS = 32
LOSS_MASK_WEIGHT = 6.125
YOLACT_STDS = (0.1, 0.1, 0.2, 0.2)


def make_yolact_anchor_generator() -> AnchorGenerator:
    """3 anchors/cell, octave_base_scale=3 (``yolact_r50_1x8_coco.py``;
    grid strides in place of the 550-px fractional strides)."""
    return AnchorGenerator(strides=list(SS_STRIDES),
                           ratios=[0.5, 1.0, 2.0], scales=[3.0])


class YOLACTHead(nn.Module):
    """``yolact_head.py:88-137``: one shared conv, then cls (softmax
    C+1), reg, and tanh coefficient convs."""
    num_classes: int
    num_anchors: int = 3
    feat_channels: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        head_conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                            kernel_init=normal_init, dtype=self.dtype,
                            name="head_conv")
        conv_cls = nn.Conv(self.num_anchors * (self.num_classes + 1),
                           (3, 3), padding=1, kernel_init=normal_init,
                           name="conv_cls")
        conv_reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                           kernel_init=normal_init, name="conv_reg")
        conv_coeff = nn.Conv(self.num_anchors * NUM_PROTOS, (3, 3),
                             padding=1, kernel_init=normal_init,
                             name="conv_coeff")
        cls_scores, bbox_preds, coeffs = [], [], []
        for x in feats:
            h = nn.relu(head_conv(x))
            cls_scores.append(conv_cls(h))
            bbox_preds.append(conv_reg(h))
            coeffs.append(jnp.tanh(conv_coeff(h)))
        return cls_scores, bbox_preds, coeffs


class Protonet(nn.Module):
    """``yolact_head.py:584-665`` default arch: 3x conv3x3(256) ->
    bilinear x2 -> conv3x3(256) -> conv1x1(32), relu between."""
    channels: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(3):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                kernel_init=normal_init, dtype=self.dtype,
                                name=f"proto_conv{i}")(x))
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
        x = nn.relu(x)
        x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                            kernel_init=normal_init, dtype=self.dtype,
                            name="proto_conv3")(x))
        return nn.Conv(NUM_PROTOS, (1, 1), kernel_init=normal_init,
                       name="proto_out")(x)


class YOLACT(_SingleStageBase):
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
        self.head = YOLACTHead(self.num_classes,
                               dtype=self.compute_dtype, name="bbox_head")
        self.protonet = Protonet(dtype=self.compute_dtype,
                                 name="protonet")
        self.segm_conv = nn.Conv(self.num_classes, (1, 1),
                                 kernel_init=normal_init,
                                 name="segm_head")

    def forward_protos(self, p3):
        return self.protonet(p3)

    def forward_segm(self, p3):
        return self.segm_conv(p3)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.extract_feat(images, train=train)
        outs = self.head(feats)
        self.protonet(feats[0])
        self.segm_conv(feats[0])
        return outs


def _crop_mask(mask: jnp.ndarray,      # (H, W) proto-res
               box: jnp.ndarray,       # (4,) normalized [0, 1]
               ) -> jnp.ndarray:
    """``yolact_head.py`` crop: zero outside the (normalized) box."""
    h, w = mask.shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    inside = ((xs[None, :] >= box[0]) & (xs[None, :] <= box[2])
              & (ys[:, None] >= box[1]) & (ys[:, None] <= box[3]))
    return mask * inside


def yolact_loss(
    model: YOLACT,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
    num_pos_masks: int = 32,        # static positive-mask slate / image
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``yolact_head.py:139-295`` + protonet/segm losses. Needs
    batch['gt_masks'] (B, G, H, W)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=YOLACT.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds, coeff_preds = model.apply(
        variables, feats, method=YOLACT.forward_head)
    protos = model.apply(variables, feats[0],
                         method=YOLACT.forward_protos)     # (B, h, w, 32)
    segm_pred = model.apply(variables, feats[0],
                            method=YOLACT.forward_segm)    # (B, h8, w8, C)

    gen = make_yolact_anchor_generator()
    shapes = ss_fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c + 1) for s in cls_scores], axis=1)
    deltas = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1)
    coeffs = jnp.concatenate(
        [x.reshape(b, -1, NUM_PROTOS) for x in coeff_preds], axis=1)
    ph, pw = protos.shape[1:3]
    g = batch["gt_boxes"].shape[1]
    m = num_pos_masks

    # downsample gt masks to proto resolution once (bilinear > 0.5)
    gt_small = jax.image.resize(
        batch["gt_masks"].astype(jnp.float32),
        (b, g, ph, pw), "bilinear") > 0.5

    def _one(score, delta, coeff, proto, gts, gtb, gtl, gtv, seg):
        assigned, _ = max_iou_assign(
            anchors, gtb, gtv, cfg.pos_iou_thr, cfg.neg_iou_thr, 0.0)
        is_pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0, g - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], c)
        n_pos = is_pos.sum()

        # softmax CE + OHEM 3:1 (loss_single_OHEM)
        logp = jax.nn.log_softmax(score.astype(jnp.float32), -1)
        ce = -jnp.take_along_axis(logp, labels[:, None], -1)[:, 0]
        pos_loss = (ce * is_pos).sum()
        neg_ce = jnp.where(is_pos, -jnp.inf, ce)
        k = min(3 * m * 4, neg_ce.shape[0])
        top_neg, _ = jax.lax.top_k(neg_ce, k)
        rank = jnp.arange(k)
        keep_neg = rank < jnp.minimum(3 * n_pos, k)
        neg_loss = jnp.where(keep_neg & jnp.isfinite(top_neg),
                             top_neg, 0.0).sum()
        l_cls = pos_loss + neg_loss

        # smooth L1 * 1.5 on positives
        tgt = bbox2delta(anchors, gtb[gt_idx], stds=YOLACT_STDS)
        diff = jnp.abs(delta - tgt)
        sl1 = jnp.where(diff < 1.0, 0.5 * diff * diff, diff - 0.5).sum(-1)
        l_bbox = 1.5 * (sl1 * is_pos).sum()

        # mask loss on a static slate of the top positives
        pos_rank = jnp.where(is_pos, 0.0, 1.0) \
            + jnp.arange(is_pos.shape[0]) * 1e-9
        slate = jnp.argsort(pos_rank)[:m]
        slate_pos = is_pos[slate]
        slate_gt = gt_idx[slate]
        mask_pred = jax.nn.sigmoid(
            jnp.einsum("hwp,mp->mhw", proto.astype(jnp.float32),
                       coeff[slate].astype(jnp.float32)))
        box_n = gtb[slate_gt] / jnp.asarray(
            [img_w, img_h, img_w, img_h], jnp.float32)
        mask_pred = jax.vmap(_crop_mask)(mask_pred, box_n)
        tgt_m = gts[slate_gt].astype(jnp.float32)
        p = jnp.clip(mask_pred, 1e-7, 1 - 1e-7)
        bce = -(tgt_m * jnp.log(p) + (1 - tgt_m) * jnp.log(1 - p))
        bw = jnp.maximum(box_n[:, 2] - box_n[:, 0], 1e-4)
        bh = jnp.maximum(box_n[:, 3] - box_n[:, 1], 1e-4)
        per = bce.mean((1, 2)) / bw / bh * LOSS_MASK_WEIGHT
        l_mask = (per * slate_pos).sum()

        # semantic aux: per-class max of gt masks at segm resolution
        sh, sw = seg.shape[:2]
        gts_seg = jax.image.resize(
            gts.astype(jnp.float32)[None], (1, g, sh, sw),
            "bilinear")[0] > 0.5
        onehot = jax.nn.one_hot(gtl, c, dtype=jnp.float32) \
            * gtv[:, None]                              # (G, C)
        seg_tgt = jnp.einsum("ghw,gc->hwc", gts_seg.astype(jnp.float32),
                             onehot) > 0
        s32 = seg.astype(jnp.float32)
        seg_bce = (jnp.maximum(s32, 0) - s32 * seg_tgt
                   + jnp.log1p(jnp.exp(-jnp.abs(s32))))
        l_segm = seg_bce.sum() / (sh * sw)
        return l_cls, l_bbox, l_mask, l_segm, n_pos

    lc, lb, lm, ls, npos = jax.vmap(_one)(
        scores, deltas, coeffs, protos, gt_small, batch["gt_boxes"],
        batch["gt_labels"], batch["gt_valid"], segm_pred)
    n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    losses = {"loss_cls": lc.sum() / n, "loss_bbox": lb.sum() / n,
              "loss_mask": lm.sum() / n, "loss_segm": ls.sum() / b}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def yolact_simple_test(
    model: YOLACT,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``yolact_head.py:296-460`` get_bboxes with FAST NMS, then the
    protonet composite cropped per detection (28x28 box grids for the
    shared paste pipeline)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=YOLACT.extract_feat)
    cls_scores, bbox_preds, coeff_preds = model.apply(
        variables, feats, method=YOLACT.forward_head)
    protos = model.apply(variables, feats[0],
                         method=YOLACT.forward_protos)
    gen = make_yolact_anchor_generator()
    anchors_np = gen.grid_anchors(ss_fpn_shapes((img_h, img_w)))
    c = model.num_classes

    lvl_boxes, lvl_scores, lvl_coeffs = [], [], []
    for s, d, cf, anc in zip(cls_scores, bbox_preds, coeff_preds,
                             anchors_np):
        s = jax.nn.softmax(
            s.reshape(b, -1, c + 1).astype(jnp.float32), -1)
        d = d.reshape(b, -1, 4).astype(jnp.float32)
        cf = cf.reshape(b, -1, NUM_PROTOS)
        anc = jnp.asarray(anc)
        k = min(cfg.nms_pre, s.shape[1])
        top_i = jax.lax.top_k(s[..., :-1].max(-1), k)[1]
        lvl_scores.append(jnp.take_along_axis(s, top_i[..., None], 1))
        sel_d = jnp.take_along_axis(d, top_i[..., None], 1)
        sel_a = jnp.take_along_axis(
            jnp.broadcast_to(anc[None], (b,) + anc.shape),
            top_i[..., None], 1)
        lvl_boxes.append(delta2bbox(sel_a, sel_d, stds=YOLACT_STDS,
                                    max_shape=(img_h, img_w)))
        lvl_coeffs.append(jnp.take_along_axis(cf, top_i[..., None], 1))

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)     # (B, N, C+1)
    coeffs = jnp.concatenate(lvl_coeffs, axis=1)

    def _one(bx, sc, cf):
        dets, s_out, l_out, valid = fast_nms(
            bx, sc, cfg.score_thr, cfg.nms_iou,
            max_per_img=cfg.max_per_img)
        return dets, s_out, l_out, valid

    dets, out_scores, labels, det_valid = jax.vmap(_one)(
        boxes, scores, coeffs)

    # coefficients of the kept detections: match by box identity via
    # nearest candidate (fast_nms reorders internally) — recompute by
    # sampling: use a dot-product argmax over candidate boxes
    def _match_coeffs(bx_cand, cf_cand, bx_det):
        d = jnp.abs(bx_cand[None, :, :] - bx_det[:, None, :]).sum(-1)
        idx = d.argmin(1)
        return cf_cand[idx]

    det_coeffs = jax.vmap(_match_coeffs)(boxes, coeffs, dets)

    # assemble + crop + per-box 28x28 resample for the paste pipeline
    k = dets.shape[1]
    ph, pw = protos.shape[1:3]
    whwh = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)

    def _masks(proto, cf, bx):
        full = jax.nn.sigmoid(jnp.einsum(
            "hwp,kp->khw", proto.astype(jnp.float32),
            cf.astype(jnp.float32)))
        full = jax.vmap(_crop_mask)(full, bx / whwh)
        # 28x28 grid inside each box, sampled at proto resolution
        jj = (jnp.arange(28, dtype=jnp.float32) + 0.5) / 28
        xs = (bx[:, 0:1] + jj[None] * (bx[:, 2:3] - bx[:, 0:1])) \
            * pw / img_w - 0.5
        ys = (bx[:, 1:2] + jj[None] * (bx[:, 3:4] - bx[:, 1:2])) \
            * ph / img_h - 0.5
        bi = jnp.broadcast_to(jnp.arange(k)[:, None, None], (k, 28, 28))
        yy = jnp.broadcast_to(ys[:, :, None], (k, 28, 28))
        xx = jnp.broadcast_to(xs[:, None, :], (k, 28, 28))
        return bilinear_sample_batched(full[..., None], bi, yy, xx)[..., 0]

    masks = jax.vmap(_masks)(protos, det_coeffs, dets)
    out = {"boxes": dets, "scores": out_scores, "labels": labels,
           "valid": det_valid, "masks": masks}
    if scale_factor is not None:
        out["boxes"] = out["boxes"] / scale_factor[:, None, :]
    return out
