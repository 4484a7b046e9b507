"""Cascade RPN (NeurIPS 2019) — two-stage anchor refinement RPN.

TPU-native rebuild of the reference's ``CascadeRPNHead`` /
``StageCascadeRPNHead`` / ``AdaptiveConv``
(``mmdet/models/dense_heads/cascade_rpn_head.py:19-784``) and
``RegionAssigner`` (``mmdet/core/bbox/assigners/region_assigner.py``),
config ``configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco.py``:

- stage 1: dilation-3 AdaptiveConv on FPN features, single square anchor
  per cell (scales [8], ratios [1]), region-assigned targets (no
  sampling, no cls branch), linear IoU loss on decoded boxes
  (stds 0.1/0.1/0.5/0.5), bridged features;
- stage 2: offset-mode AdaptiveConv — a 3x3 deform conv whose offsets
  are computed *analytically from the refined anchors*
  (``anchor_offset``, :327-398) — MaxIoU(0.7/0.7/0.3) assignment with
  256@0.5 random sampling, sigmoid BCE cls + linear IoU loss
  (stds 0.05/0.05/0.1/0.1);
- proposals from stage-2 scores on twice-refined anchors, per-level
  top-2000 + NMS(0.8), 2000 per image.

TPU-first deltas: the per-gt sequential region painting of
``RegionAssigner.assign`` becomes an order-free vectorized reduction
(the last-painted gt is the highest index, so a max over touching gt
ids reproduces paint order exactly); per-image python loops are
``vmap``; anchor offsets are computed in-graph so stage-2's deform conv
differentiates through features (offsets are data, not params).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    fpn_shapes,
    normalize_if_uint8,
)
from iif_tpu.detection.losses import iou_loss
from iif_tpu.detection.necks import FPN
from iif_tpu.detection.rpn_detector import _DEPTH_LAYERS
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.boxes import delta2bbox
from iif_tpu.ops.nms import nms
from iif_tpu.ops.sampler import random_sample_pos_neg

CRPN_STRIDES = (4, 8, 16, 32, 64)
STAGE1_STDS = (0.1, 0.1, 0.5, 0.5)
STAGE2_STDS = (0.05, 0.05, 0.1, 0.1)

normal_init = nn.initializers.normal(stddev=0.01)


def make_crpn_anchor_generator() -> AnchorGenerator:
    """One square anchor per cell: scales [8], ratios [1.0]."""
    return AnchorGenerator(strides=list(CRPN_STRIDES), ratios=[1.0],
                           scales=[8.0])


# ------------------------------------------------------------------ heads
class StageCascadeRPNHead(nn.Module):
    """One cascade stage (``cascade_rpn_head.py:96-161``): AdaptiveConv
    trunk + 1x1 reg (and optionally cls) convs; ``adapt`` selects the
    dilation (stage 1) or anchor-offset deform (stage 2) trunk."""
    feat_channels: int = 256
    adapt: str = "dilation"        # 'dilation' | 'offset'
    dilation: int = 3
    with_cls: bool = True
    bridged_feature: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 offsets: Optional[Sequence[jnp.ndarray]] = None):
        """offsets: per level (B, H, W, 9, 2) (dy, dx) — offset mode only.
        Returns (bridged_feats, cls_scores | None, bbox_preds)."""
        if self.adapt == "offset":
            w_ada = self.param("rpn_conv_kernel", normal_init,
                               (3, 3, self.feat_channels,
                                self.feat_channels))
        else:
            conv = nn.Conv(self.feat_channels, (3, 3),
                           kernel_dilation=self.dilation,
                           padding=self.dilation, use_bias=False,
                           kernel_init=normal_init, dtype=self.dtype,
                           name="rpn_conv")
        cls_conv = (nn.Conv(1, (1, 1), kernel_init=normal_init,
                            name="rpn_cls") if self.with_cls else None)
        reg_conv = nn.Conv(4, (1, 1), kernel_init=normal_init,
                           name="rpn_reg")

        out_feats, cls_scores, bbox_preds = [], [], []
        for lvl, x in enumerate(feats):
            if self.adapt == "offset":
                from iif_tpu.ops.deform import deform_conv2d

                t = deform_conv2d(x.astype(jnp.float32),
                                  offsets[lvl].astype(jnp.float32),
                                  w_ada.astype(jnp.float32))
                if self.dtype is not None:
                    t = t.astype(self.dtype)
            else:
                t = conv(x)
            t = nn.relu(t)
            out_feats.append(t if self.bridged_feature else x)
            if cls_conv is not None:
                cls_scores.append(cls_conv(t))
            bbox_preds.append(reg_conv(t))
        return (tuple(out_feats),
                tuple(cls_scores) if self.with_cls else None,
                tuple(bbox_preds))


class CascadeRPN(nn.Module):
    """``type='CascadeRPN'`` — RPN-only detector whose head is the
    2-stage cascade (reference ``configs/cascade_rpn/crpn_r50_caffe_fpn_
    1x_coco.py``; detector class ``RPN`` with ``CascadeRPNHead``)."""

    num_classes: int = 1          # class-agnostic; uniform CLI surface
    depth: int = 50
    frozen_stages: int = 1
    norm_eval: bool = True
    backbone_remat: bool = False
    compute_dtype: object = None
    with_mask: bool = False

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        dtype=self.compute_dtype, name="neck")
        self.stage0 = StageCascadeRPNHead(
            adapt="dilation", with_cls=False, bridged_feature=True,
            dtype=self.compute_dtype, name="stage0")
        self.stage1 = StageCascadeRPNHead(
            adapt="offset", with_cls=True, bridged_feature=False,
            dtype=self.compute_dtype, name="stage1")

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        return self.neck(feats)

    def forward_stages(self, feats, img_hw: Tuple[int, int]):
        """Both cascade stages + in-graph anchor refinement. Returns
        (refined per-level anchors (B, A_l, 4), stage1 reg, stage2 cls,
        stage2 reg) — the pieces every consumer (loss / proposals)
        needs (``CascadeRPNHead.forward_train`` loop :720-745)."""
        shapes = [tuple(f.shape[1:3]) for f in feats]
        b = feats[0].shape[0]
        gen = make_crpn_anchor_generator()
        anchors = [jnp.broadcast_to(jnp.asarray(a)[None],
                                    (b,) + a.shape)
                   for a in gen.grid_anchors(shapes)]

        feats, _, reg0 = self.stage0(feats)
        refined = refine_anchors(anchors, reg0, STAGE1_STDS, img_hw)
        offsets = [anchor_offsets(a, s, hw)
                   for a, s, hw in zip(refined, CRPN_STRIDES, shapes)]
        _, cls1, reg1 = self.stage1(feats, offsets)
        return anchors, reg0, refined, cls1, reg1

    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.extract_feat(images, train=train)
        return self.forward_stages(feats, images.shape[1:3])


# ----------------------------------------------------- anchor machinery
def refine_anchors(anchors: Sequence[jnp.ndarray],
                   bbox_preds: Sequence[jnp.ndarray],
                   stds: Tuple[float, ...],
                   img_hw: Tuple[int, int]) -> List[jnp.ndarray]:
    """Decode stage predictions into the next stage's anchors
    (``refine_bboxes``, :533-547). anchors (B, A_l, 4)."""
    out = []
    for anc, pred in zip(anchors, bbox_preds):
        b = anc.shape[0]
        d = pred.reshape(b, -1, 4).astype(jnp.float32)
        out.append(delta2bbox(anc.reshape(-1, 4), d.reshape(-1, 4),
                              stds=stds, max_shape=img_hw
                              ).reshape(anc.shape))
    return out


def anchor_offsets(anchors: jnp.ndarray, stride: int,
                   shape: Tuple[int, int]) -> jnp.ndarray:
    """Deform-conv offsets that move the 3x3 taps onto the anchor
    (``anchor_offset``, :327-398): center offset = anchor center on the
    feature grid minus the cell position; shape offset scales the tap
    spacing to w/2 x h/2 cells. anchors (B, H*W, 4) -> (B, H, W, 9, 2)
    (dy, dx), matching ``ops.deform.deform_conv2d``."""
    b = anchors.shape[0]
    h, w = shape
    f = anchors.astype(jnp.float32) / stride
    cx = (f[..., 0] + f[..., 2]) * 0.5
    cy = (f[..., 1] + f[..., 3]) * 0.5
    xs = jnp.tile(jnp.arange(w, dtype=jnp.float32), h)
    ys = jnp.repeat(jnp.arange(h, dtype=jnp.float32), w)
    ctr_x = cx - xs[None]
    ctr_y = cy - ys[None]
    # tap grid (ks=3, dilation=1): xx, yy in {-1, 0, 1}
    idx = jnp.arange(-1, 2, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(idx, idx, indexing="ij")
    xx = xx.reshape(-1)
    yy = yy.reshape(-1)
    sw = (f[..., 2] - f[..., 0]) / 2.0 - 1.0
    sh = (f[..., 3] - f[..., 1]) / 2.0 - 1.0
    off_x = sw[..., None] * xx + ctr_x[..., None]      # (B, HW, 9)
    off_y = sh[..., None] * yy + ctr_y[..., None]
    off = jnp.stack([off_y, off_x], axis=-1)           # (B, HW, 9, 2)
    return off.reshape(b, h, w, 9, 2)


def region_assign(anchors: Sequence[jnp.ndarray],   # per level (A_l, 4)
                  shapes: Sequence[Tuple[int, int]],
                  gt_boxes: jnp.ndarray,            # (G, 4)
                  gt_valid: jnp.ndarray,            # (G,)
                  anchor_scale: float = 8.0,
                  strides: Sequence[int] = CRPN_STRIDES,
                  center_ratio: float = 0.2,
                  ignore_ratio: float = 0.5) -> jnp.ndarray:
    """``RegionAssigner.assign`` (region_assigner.py:59-229) for one
    image: each gt paints, on the level matching its scale, a center
    region positive and an ignore-ratio region ignored (also on the two
    adjacent levels). Returns flat (A_tot,) with -1 ignore / 0 neg /
    gt+1.

    The reference paints gts sequentially (later gts overwrite); since
    "later" is "higher index" and the center region is a subset of the
    ignore region (r1 > r2), the final value at an anchor is decided by
    the highest-index touching gt — a vectorized max."""
    num_lvls = len(shapes)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    g = gt_boxes.shape[0]
    scale = jnp.sqrt(jnp.clip((gt_boxes[:, 2] - gt_boxes[:, 0])
                              * (gt_boxes[:, 3] - gt_boxes[:, 1]), 1e-12))
    min_sz = float(anchor_scale * strides[0])
    tgt_lvl = jnp.clip(jnp.floor(jnp.log2(scale / min_sz) + 0.5),
                       0, num_lvls - 1).astype(jnp.int32)
    gt_ids = jnp.arange(1, g + 1, dtype=jnp.int32)

    def inside(anc, stride, r, h, w, active):
        """(G, A_l) anchor centers inside each gt's r-region
        (``calc_region`` + ``anchor_ctr_inside_region_flags``)."""
        f = gt_boxes / stride
        x1 = jnp.clip(jnp.round((1 - r) * f[:, 0] + r * f[:, 2]), 0, w)
        y1 = jnp.clip(jnp.round((1 - r) * f[:, 1] + r * f[:, 3]), 0, h)
        x2 = jnp.clip(jnp.round(r * f[:, 0] + (1 - r) * f[:, 2]), 0, w)
        y2 = jnp.clip(jnp.round(r * f[:, 1] + (1 - r) * f[:, 3]), 0, h)
        fa = anc / stride
        ax = (fa[:, 0] + fa[:, 2]) * 0.5
        ay = (fa[:, 1] + fa[:, 3]) * 0.5
        m = ((ax[None] >= x1[:, None]) & (ax[None] <= x2[:, None])
             & (ay[None] >= y1[:, None]) & (ay[None] <= y2[:, None]))
        return m & active[:, None]

    out = []
    for lvl in range(num_lvls):
        h, w = shapes[lvl]
        anc = anchors[lvl]
        a = anc.shape[0]
        on_lvl = gt_valid & (tgt_lvl == lvl)
        ign = inside(anc, strides[lvl], r2, h, w, on_lvl)   # (G, A)
        ctr = inside(anc, strides[lvl], r1, h, w, on_lvl)
        best = jnp.max(jnp.where(ign, gt_ids[:, None], 0), axis=0)
        in_ctr = jnp.take_along_axis(
            ctr, jnp.clip(best - 1, 0)[None], axis=0)[0]
        assigned = jnp.where(best > 0,
                             jnp.where(in_ctr, best, -1), 0)
        # adjacent-level ignore painting overrides everything (:196-201)
        near = gt_valid & ((tgt_lvl == lvl - 1) | (tgt_lvl == lvl + 1))
        adj = inside(anc, strides[lvl], r2, h, w, near).any(axis=0)
        out.append(jnp.where(adj, -1, assigned))
    return jnp.concatenate(out)


# ------------------------------------------------------------------ loss
def cascade_rpn_loss(
    model: CascadeRPN,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: DetTrainCfg = DetTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Stage losses (``StageCascadeRPNHead.loss``, :435-503):

    - s0: region-assigned positives, no sampling -> avg factor is the
      hard-coded total/200 (:477-481); linear IoU x 10 on decoded boxes.
    - s1: MaxIoU 0.7/0.7/0.3 on the refined anchors, 256@0.5 random
      sampling, BCE cls + linear IoU x 10 (decoded, stds 0.05/0.1)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=CascadeRPN.extract_feat,
        mutable=["batch_stats"])
    anchors, reg0, refined, cls1, reg1 = model.apply(
        variables, feats, (img_h, img_w),
        method=CascadeRPN.forward_stages)

    shapes = [tuple(f.shape[1:3]) for f in feats]
    anchors_flat = jnp.concatenate([a[0] for a in anchors], axis=0)
    lvl_anchors = [a[0] for a in anchors]
    reg0_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in reg0], axis=1).astype(jnp.float32)
    refined_flat = jnp.concatenate(refined, axis=1)
    cls1_flat = jnp.concatenate(
        [s.reshape(b, -1) for s in cls1], axis=1).astype(jnp.float32)
    reg1_flat = jnp.concatenate(
        [r.reshape(b, -1, 4) for r in reg1], axis=1).astype(jnp.float32)
    a_tot = anchors_flat.shape[0]

    # ------------------------------------------------------- stage 0
    def _s0_one(delta, gtb, gtv):
        assigned = region_assign(lvl_anchors, shapes, gtb, gtv)
        pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        decoded = delta2bbox(anchors_flat, delta, stds=STAGE1_STDS)
        per = iou_loss(decoded, gtb[gt_idx], mode="linear")
        return (per * pos).sum()

    l0 = jax.vmap(_s0_one)(reg0_flat, batch["gt_boxes"],
                           batch["gt_valid"])
    loss_s0 = 10.0 * l0.sum() / (b * a_tot / 200.0)

    # ------------------------------------------------------- stage 1
    keys = jax.random.split(key, b)

    def _s1_one(anc, score, delta, gtb, gtv, k):
        assigned, _ = max_iou_assign(anc, gtb, gtv, 0.7, 0.7, 0.3)
        inds, is_pos, sample_valid = random_sample_pos_neg(
            k, assigned, num=256, pos_fraction=0.5)
        labels = is_pos.astype(jnp.float32)
        w = sample_valid.astype(jnp.float32)
        s = score[inds]
        bce = (jnp.maximum(s, 0) - s * labels
               + jnp.log1p(jnp.exp(-jnp.abs(s))))
        l_cls = (bce * w).sum()
        gt_idx = jnp.clip(assigned[inds] - 1, 0, gtb.shape[0] - 1)
        decoded = delta2bbox(anc[inds], delta[inds], stds=STAGE2_STDS)
        l_reg = (iou_loss(decoded, gtb[gt_idx], mode="linear")
                 * labels * w).sum()
        return l_cls, l_reg, w.sum()

    lc, lr, n = jax.vmap(_s1_one)(refined_flat, cls1_flat, reg1_flat,
                                  batch["gt_boxes"], batch["gt_valid"],
                                  keys)
    denom = jnp.maximum(n.sum(), 1.0)
    losses = {"loss_s0_reg": loss_s0,
              "loss_s1_cls": lc.sum() / denom,
              "loss_s1_reg": 10.0 * lr.sum() / denom}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


# ------------------------------------------------------------- proposals
def cascade_rpn_simple_test(
    model: CascadeRPN,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: DetTestCfg = DetTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Proposal slate from stage-2 scores on refined anchors
    (``simple_test_rpn`` + ``_get_bboxes_single``, :549-672; test_cfg
    nms_pre 2000, nms 0.8, max_per_img 2000 — capped at
    ``cfg.rpn_max_per_img`` for the fixed slate)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=CascadeRPN.extract_feat)
    _, _, refined, cls1, reg1 = model.apply(
        variables, feats, (img_h, img_w),
        method=CascadeRPN.forward_stages)

    out_boxes, out_scores = [], []
    for anc, s, d in zip(refined, cls1, reg1):
        sc = jax.nn.sigmoid(s.reshape(b, -1).astype(jnp.float32))
        d = d.reshape(b, -1, 4).astype(jnp.float32)
        k = min(cfg.rpn_nms_pre, sc.shape[1])
        if sc.shape[1] >= 8192:
            top_s, top_i = jax.lax.approx_max_k(sc, k, recall_target=0.95)
        else:
            top_s, top_i = jax.lax.top_k(sc, k)
        sel_a = jnp.take_along_axis(anc, top_i[..., None], axis=1)
        sel_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        boxes = delta2bbox(sel_a.reshape(-1, 4), sel_d.reshape(-1, 4),
                           stds=STAGE2_STDS, max_shape=(img_h, img_w)
                           ).reshape(b, k, 4)

        def _one(bx, scs):
            keep, order = nms(bx, scs, 0.8)
            return bx[order], jnp.where(keep, scs[order], -jnp.inf)

        bx_l, sc_l = jax.vmap(_one)(boxes, top_s)
        out_boxes.append(bx_l)
        out_scores.append(sc_l)

    boxes = jnp.concatenate(out_boxes, axis=1)
    scores = jnp.concatenate(out_scores, axis=1)
    k_out = min(cfg.rpn_max_per_img, scores.shape[1])

    def _sel(bx, sc):
        top_s, top_i = jax.lax.top_k(sc, k_out)
        valid = jnp.isfinite(top_s)
        return (jnp.where(valid[:, None], bx[top_i], 0.0),
                jnp.where(valid, top_s, 0.0), valid)

    out_b, out_s, out_v = jax.vmap(_sel)(boxes, scores)
    if scale_factor is not None:
        out_b = out_b / scale_factor[:, None, :]
    return {"boxes": out_b, "scores": out_s,
            "labels": jnp.zeros(out_s.shape, jnp.int32), "valid": out_v}
