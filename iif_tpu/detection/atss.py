"""ATSS detector (Adaptive Training Sample Selection), static-shape.

Rebuild of the reference's ATSS family
(``mmdet/models/detectors/atss.py``, head
``mmdet/models/dense_heads/atss_head.py``, assigner
``mmdet/core/bbox/assigners/atss_assigner.py``, config
``configs/atss/atss_r50_fpn_1x_coco.py``): one anchor per cell
(octave_base_scale=8, ratio 1), GN(32) conv towers, per-level learnable
reg scales, a centerness branch on the reg tower, focal cls loss, GIoU
bbox loss (weight 2) normalized by the centerness-target sum, and BCE
centerness loss.

The adaptive assignment (``atss_assigner.py:34-180``) picks, per gt, the
``topk`` closest anchor centers on each pyramid level as candidates,
thresholds their IoUs at mean+std, and keeps candidates whose center
lies inside the gt; anchors claimed by several gts take the max-IoU one.
Here that whole procedure is one vectorized static-shape function — the
reference's per-level python loop becomes a static unroll over the five
levels (shapes are compile-time constants), and the per-gt scatter
becomes a one-hot max over a (N, G) eligibility matrix.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.losses import iou_loss, sigmoid_focal_loss
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
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.boxes import bbox_overlaps, delta2bbox
from iif_tpu.ops.nms import multiclass_nms

ATSS_DELTA_STDS = (0.1, 0.1, 0.2, 0.2)
_INF = 1e8


def make_atss_anchor_generator() -> AnchorGenerator:
    """ATSS anchors (``atss_r50_fpn_1x_coco.py:30-35``: ratios [1.0],
    octave_base_scale=8, scales_per_octave=1 -> a single 8*stride square
    anchor per cell)."""
    return AnchorGenerator(strides=list(SS_STRIDES), ratios=[1.0],
                           scales=[8.0])


def atss_assign(anchors: jnp.ndarray,          # (N, 4)
                level_sizes: Sequence[int],    # static per-level anchor counts
                gt_boxes: jnp.ndarray,         # (G, 4) padded
                gt_valid: jnp.ndarray,         # (G,) bool
                topk: int = 9) -> jnp.ndarray:
    """Adaptive assignment (``atss_assigner.py:34-180``). Returns
    assigned_gt_inds (N,) int32 with mmdet's convention: 0 = background,
    i+1 = matched to gt i. Padded (invalid) gts never claim anchors."""
    num_gt = gt_boxes.shape[0]
    iou = bbox_overlaps(anchors, gt_boxes)                      # (N, G)

    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    dist = jnp.sqrt((acx[:, None] - gcx[None, :]) ** 2
                    + (acy[:, None] - gcy[None, :]) ** 2)       # (N, G)

    # per-level top-k closest candidates (static unroll; level sizes are
    # compile-time constants so every top_k has a fixed k)
    cand_rows: List[jnp.ndarray] = []
    start = 0
    for n in level_sizes:
        k = min(topk, n)
        d = dist[start:start + n]                               # (n, G)
        idx = jax.lax.top_k(-d.T, k)[1].T                       # (k, G)
        cand_rows.append(idx + start)
        start += n
    cand = jnp.concatenate(cand_rows, axis=0)                   # (K, G)

    g_idx = jnp.arange(num_gt)[None, :]
    cand_iou = iou[cand, g_idx]                                 # (K, G)
    thr = cand_iou.mean(0) + cand_iou.std(0, ddof=1)            # (G,)
    is_pos = cand_iou >= thr[None, :]

    # candidate centers strictly inside the gt (>0.01 px margin)
    ccx, ccy = acx[cand], acy[cand]                             # (K, G)
    inside = jnp.minimum(
        jnp.minimum(ccx - gt_boxes[None, :, 0], ccy - gt_boxes[None, :, 1]),
        jnp.minimum(gt_boxes[None, :, 2] - ccx, gt_boxes[None, :, 3] - ccy),
    ) > 0.01
    is_pos = is_pos & inside & gt_valid[None, :]

    # (N, G) eligibility by scatter-max, then per-anchor max-IoU gt wins
    elig = jnp.zeros((anchors.shape[0], num_gt), jnp.int32)
    elig = elig.at[cand, g_idx].max(is_pos.astype(jnp.int32))
    elig_iou = jnp.where(elig > 0, iou, -_INF)
    max_o = elig_iou.max(axis=1)
    arg = elig_iou.argmax(axis=1).astype(jnp.int32)
    return jnp.where(max_o > -_INF * 0.5, arg + 1, 0)


class ATSSHead(nn.Module):
    """4x(conv3x3+GN32+relu) towers + 1-anchor cls/reg/centerness convs
    with per-level reg scales (``atss_head.py:59-142``; centerness on the
    REG tower, unlike FCOS)."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray],
                            List[jnp.ndarray]]:
        def tower(prefix):
            return [(nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init, dtype=self.dtype,
                             name=f"{prefix}_conv_{i}"),
                     nn.GroupNorm(num_groups=32, name=f"{prefix}_gn_{i}"))
                    for i in range(self.stacked_convs)]

        cls_tower = tower("cls")
        reg_tower = tower("reg")
        atss_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="atss_cls")
        atss_reg = nn.Conv(4, (3, 3), padding=1, kernel_init=normal_init,
                           name="atss_reg")
        atss_centerness = nn.Conv(1, (3, 3), padding=1,
                                  kernel_init=normal_init,
                                  name="atss_centerness")
        scales = [self.param(f"scale_{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]
        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            cls_scores.append(atss_cls(c))
            # raw scaled deltas, no exp (`atss_head.py:139`), kept f32
            bbox_preds.append(
                atss_reg(r).astype(jnp.float32) * scales[lvl])
            centernesses.append(atss_centerness(r))
        return cls_scores, bbox_preds, centernesses


class ATSS(_SingleStageBase):
    """ATSS R50-FPN (``configs/atss/atss_r50_fpn_1x_coco.py``: FPN
    start_level=1, extra convs on_output, GN head, ATSSAssigner topk=9)."""

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
        self.head = ATSSHead(self.num_classes, dtype=self.compute_dtype,
                             name="bbox_head")


def _anchor_centerness(anchors: jnp.ndarray, gts: jnp.ndarray,
                       eps: float = 1e-6) -> jnp.ndarray:
    """``atss_head.py:294-310`` centerness_target on anchor centers."""
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    l = acx - gts[:, 0]
    t = acy - gts[:, 1]
    r = gts[:, 2] - acx
    b = gts[:, 3] - acy
    lr = jnp.stack([l, r], -1)
    tb = jnp.stack([t, b], -1)
    prod = ((lr.min(-1) / jnp.maximum(lr.max(-1), eps))
            * (tb.min(-1) / jnp.maximum(tb.max(-1), eps)))
    return jnp.sqrt(jnp.clip(prod, 0.0))


def atss_loss(
    model: ATSS,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused (no sampling); uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``atss_head.py:164-292`` loss: focal cls over all anchors / num_pos,
    GIoU(decoded pred, gt)*2 weighted by centerness targets / their sum,
    BCE centerness / num_pos. num_pos and the centerness sum are summed
    over the (global, under pjit-psum) batch like the reference's
    ``reduce_mean``."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=ATSS.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds, centernesses = model.apply(
        variables, feats, method=ATSS.forward_head)

    gen = make_atss_anchor_generator()
    shapes = ss_fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    level_sizes = [fh * fw for fh, fw in shapes]
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    deltas = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1)
    ctr_pred = jnp.concatenate(
        [x.reshape(b, -1) for x in centernesses], axis=1)

    def _one(score, delta, ctr, gtb, gtl, gtv):
        assigned = atss_assign(anchors, level_sizes, gtb, gtv)
        is_pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], c)
        l_cls = sigmoid_focal_loss(score, labels, c, cfg.gamma,
                                   cfg.alpha).sum()
        gt_of = gtb[gt_idx]
        ctr_tgt = jnp.where(is_pos, _anchor_centerness(anchors, gt_of), 0.0)
        decoded = delta2bbox(anchors, delta, stds=ATSS_DELTA_STDS)
        l_bbox = (iou_loss(decoded, gt_of, "giou") * ctr_tgt).sum() * 2.0
        bce = (jnp.maximum(ctr, 0) - ctr * ctr_tgt
               + jnp.log1p(jnp.exp(-jnp.abs(ctr))))
        l_ctr = (bce * is_pos).sum()
        return l_cls, l_bbox, l_ctr, is_pos.sum(), ctr_tgt.sum()

    lc, lb, lctr, npos, ctr_sum = jax.vmap(_one)(
        scores.astype(jnp.float32), deltas,
        ctr_pred.astype(jnp.float32), batch["gt_boxes"],
        batch["gt_labels"], batch["gt_valid"])
    n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    cs = jnp.maximum(ctr_sum.sum(), 1.0)
    losses = {"loss_cls": lc.sum() / n, "loss_bbox": lb.sum() / cs,
              "loss_centerness": lctr.sum() / n}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def atss_simple_test(
    model: ATSS,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-level top-``nms_pre`` ranked by max(score*centerness), delta
    decode with the (0.1, 0.2) stds, centerness-scaled multiclass NMS
    (``atss_head.py:312-505`` with score_factors)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=ATSS.extract_feat)
    cls_scores, bbox_preds, centernesses = model.apply(
        variables, feats, method=ATSS.forward_head)
    gen = make_atss_anchor_generator()
    anchors_np = gen.grid_anchors(ss_fpn_shapes((img_h, img_w)))
    c = model.num_classes

    lvl_boxes, lvl_scores = [], []
    for s, d, ct, anc in zip(cls_scores, bbox_preds, centernesses,
                             anchors_np):
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        ct = jax.nn.sigmoid(ct.reshape(b, -1).astype(jnp.float32))
        d = d.reshape(b, -1, 4).astype(jnp.float32)
        anc = jnp.asarray(anc)
        k = min(cfg.nms_pre, s.shape[1])
        rank = (s * ct[..., None]).max(-1)
        top_i = jax.lax.top_k(rank, k)[1]
        sel_s = jnp.take_along_axis(s * ct[..., None],
                                    top_i[..., None], axis=1)
        sel_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        sel_a = jnp.take_along_axis(
            jnp.broadcast_to(anc[None], (b,) + anc.shape),
            top_i[..., None], axis=1)
        lvl_boxes.append(delta2bbox(sel_a, sel_d, stds=ATSS_DELTA_STDS,
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
