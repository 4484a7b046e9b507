"""YOLOX detector (CSPDarknet + PAFPN + decoupled head + SimOTA),
static-shape.

Rebuild of the reference's YOLOX family
(``configs/yolox/yolox_s_8x8_300e_coco.py``, backbone
``mmdet/models/backbones/csp_darknet.py``, neck
``mmdet/models/necks/yolox_pafpn.py``, head
``mmdet/models/dense_heads/yolox_head.py``, assigner
``mmdet/core/bbox/assigners/sim_ota_assigner.py``):

- CSPDarknet-P5 with Focus stem, Swish activations, BN(momentum 0.03,
  eps 1e-3), SPP on the last stage; ``deepen_factor``/``widen_factor``
  scale depth/width (yolox-s: 0.33/0.5).
- PAFPN: top-down reduce+CSP then bottom-up downsample+CSP, 1x1 out
  convs.
- Decoupled per-level towers (2 convs each) with 1x1 cls/reg/obj
  predictors; anchor-free point priors, strides (8, 16, 32).
- SimOTA: candidate priors inside gt or inside a 2.5-stride center
  region; cost = BCE(sqrt(cls*obj), onehot) + 3*(-log IoU) + INF
  outside box&center; per-gt dynamic-k = clamp(sum top-10 IoU, 1);
  conflicts resolved by min cost.

The reference's dynamic-shape assignment (boolean indexing + per-gt
``topk(k=dynamic_k)``) becomes static rank tests: per-gt cost ranks via
one argsort and ``rank < dynamic_k`` — the same selection with fixed
shapes, vmapped over the batch.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.single_stage import (
    SSTestCfg,
    _SingleStageBase,
    bias_init_with_prob,
)
from iif_tpu.ops.boxes import bbox_overlaps
from iif_tpu.ops.nms import batched_nms

_INF = 1e8

kaiming_uniform = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")   # torch Kaiming a=sqrt(5) uniform


class ConvBNAct(nn.Module):
    """ConvModule(conv + BN(momentum 0.03, eps 1e-3) + Swish)."""
    out_channels: int
    kernel: int = 1
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=(self.kernel - 1) // 2, use_bias=False,
                    kernel_init=kaiming_uniform, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.silu(x)


class DarknetBottleneck(nn.Module):
    """1x1 -> 3x3 with optional identity (``csp_layer.py:8-72``)."""
    out_channels: int
    add_identity: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        hidden = self.out_channels // 2
        out = ConvBNAct(hidden, 1, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNAct(self.out_channels, 3, dtype=self.dtype,
                        name="conv2")(out, train)
        if self.add_identity and x.shape[-1] == self.out_channels:
            out = out + x
        return out


class CSPLayer(nn.Module):
    """Cross Stage Partial layer (``csp_layer.py:75-155``)."""
    out_channels: int
    num_blocks: int = 1
    add_identity: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = self.out_channels // 2
        main = ConvBNAct(mid, 1, dtype=self.dtype, name="main_conv")(x, train)
        short = ConvBNAct(mid, 1, dtype=self.dtype,
                          name="short_conv")(x, train)
        for i in range(self.num_blocks):
            main = DarknetBottleneck(mid, self.add_identity,
                                     dtype=self.dtype,
                                     name=f"block_{i}")(main, train)
        out = jnp.concatenate([main, short], axis=-1)
        return ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                         name="final_conv")(out, train)


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (``csp_darknet.py:67-121``)."""
    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mid = x.shape[-1] // 2
        x = ConvBNAct(mid, 1, dtype=self.dtype, name="conv1")(x, train)
        pools = [nn.max_pool(x, (k, k), strides=(1, 1),
                             padding=((k // 2, k // 2), (k // 2, k // 2)))
                 for k in self.kernel_sizes]
        x = jnp.concatenate([x] + pools, axis=-1)
        return ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                         name="conv2")(x, train)


class Focus(nn.Module):
    """Space-to-depth stem (``csp_darknet.py:14-64``; channel order
    [top-left, bottom-left, top-right, bottom-right])."""
    out_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        tl = x[:, ::2, ::2]
        bl = x[:, 1::2, ::2]
        tr = x[:, ::2, 1::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBNAct(self.out_channels, 3, dtype=self.dtype,
                         name="conv")(x, train)


# P5 arch: in, out, num_blocks, add_identity, use_spp (csp_darknet.py:168)
_P5_ARCH = ((64, 128, 3, True, False), (128, 256, 9, True, False),
            (256, 512, 9, True, False), (512, 1024, 3, False, True))


class CSPDarknet(nn.Module):
    """``csp_darknet.py:124-284`` P5, out_indices (2, 3, 4)."""
    deepen_factor: float = 0.33
    widen_factor: float = 0.5
    out_indices: Sequence[int] = (2, 3, 4)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = True) -> List[jnp.ndarray]:
        x = Focus(int(64 * self.widen_factor), dtype=self.dtype,
                  name="stem")(x, train)
        outs = []
        for i, (_, c_out, n, add_id, use_spp) in enumerate(_P5_ARCH):
            c = int(c_out * self.widen_factor)
            blocks = max(round(n * self.deepen_factor), 1)
            x = ConvBNAct(c, 3, stride=2, dtype=self.dtype,
                          name=f"stage{i + 1}_conv")(x, train)
            if use_spp:
                x = SPPBottleneck(c, dtype=self.dtype,
                                  name=f"stage{i + 1}_spp")(x, train)
            x = CSPLayer(c, blocks, add_id, dtype=self.dtype,
                         name=f"stage{i + 1}_csp")(x, train)
            if (i + 1) in self.out_indices:
                outs.append(x)
        return outs


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class YOLOXPAFPN(nn.Module):
    """``yolox_pafpn.py:14-156``: top-down (reduce 1x1, concat upsample,
    CSP) then bottom-up (3x3/s2 downsample, concat, CSP), 1x1 out convs."""
    in_channels: Sequence[int] = (128, 256, 512)
    out_channels: int = 128
    num_csp_blocks: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False
                 ) -> Tuple[jnp.ndarray, ...]:
        n = len(self.in_channels)
        inner = [inputs[-1]]
        for idx in range(n - 1, 0, -1):
            j = n - 1 - idx
            high = ConvBNAct(self.in_channels[idx - 1], 1, dtype=self.dtype,
                             name=f"reduce_{j}")(inner[0], train)
            inner[0] = high
            cat = jnp.concatenate([_upsample2(high), inputs[idx - 1]], -1)
            inner.insert(0, CSPLayer(
                self.in_channels[idx - 1], self.num_csp_blocks, False,
                dtype=self.dtype, name=f"top_down_{j}")(cat, train))
        outs = [inner[0]]
        for idx in range(n - 1):
            down = ConvBNAct(self.in_channels[idx], 3, stride=2,
                             dtype=self.dtype,
                             name=f"downsample_{idx}")(outs[-1], train)
            cat = jnp.concatenate([down, inner[idx + 1]], -1)
            outs.append(CSPLayer(
                self.in_channels[idx + 1], self.num_csp_blocks, False,
                dtype=self.dtype, name=f"bottom_up_{idx}")(cat, train))
        return tuple(
            ConvBNAct(self.out_channels, 1, dtype=self.dtype,
                      name=f"out_conv_{i}")(o, train)
            for i, o in enumerate(outs))


YOLOX_STRIDES = (8, 16, 32)


class YOLOXHead(nn.Module):
    """Per-level decoupled towers (``yolox_head.py:130-198``): 2 stacked
    3x3 ConvBNAct per branch, 1x1 cls/reg/obj predictors (cls/obj bias
    at the 0.01 prior)."""
    num_classes: int
    feat_channels: int = 128
    stacked_convs: int = 2
    num_levels: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray],
                            List[jnp.ndarray]]:
        prior_bias = nn.initializers.constant(bias_init_with_prob(0.01))
        cls_scores, bbox_preds, objectnesses = [], [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for i in range(self.stacked_convs):
                c = ConvBNAct(self.feat_channels, 3, dtype=self.dtype,
                              name=f"cls_tower_{lvl}_{i}")(c, train)
                r = ConvBNAct(self.feat_channels, 3, dtype=self.dtype,
                              name=f"reg_tower_{lvl}_{i}")(r, train)
            cls_scores.append(
                nn.Conv(self.num_classes, (1, 1), bias_init=prior_bias,
                        dtype=self.dtype, name=f"conv_cls_{lvl}")(c))
            bbox_preds.append(
                nn.Conv(4, (1, 1), dtype=self.dtype,
                        name=f"conv_reg_{lvl}")(r))
            objectnesses.append(
                nn.Conv(1, (1, 1), bias_init=prior_bias, dtype=self.dtype,
                        name=f"conv_obj_{lvl}")(r))
        return cls_scores, bbox_preds, objectnesses


class YOLOX(_SingleStageBase):
    """YOLOX (``yolox_s_8x8_300e_coco.py``; ``deepen``/``widen`` pick the
    s/m/l/x size: s=(0.33, 0.5), l=(1.0, 1.0))."""
    deepen: float = 0.33
    widen: float = 0.5

    def setup(self):
        self.backbone = CSPDarknet(self.deepen, self.widen,
                                   dtype=self.compute_dtype, name="backbone")
        chans = tuple(int(c * self.widen) for c in (256, 512, 1024))
        self.neck = YOLOXPAFPN(chans, chans[0], dtype=self.compute_dtype,
                               name="neck")
        self.head = YOLOXHead(self.num_classes, feat_channels=chans[0],
                              dtype=self.compute_dtype, name="bbox_head")

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        from iif_tpu.detection.detector import normalize_if_uint8

        feats = self.backbone(normalize_if_uint8(images), train=train)
        return self.neck(feats, train=train)

    def forward_head(self, fpn_feats, train: bool = False):
        return self.head(fpn_feats, train=train)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        return self.forward_head(self.extract_feat(images, train), train)


# ------------------------------------------------------------------ priors
def yolox_priors(img_hw: Tuple[int, int],
                 strides: Sequence[int] = YOLOX_STRIDES) -> np.ndarray:
    """MlvlPointGenerator(offset=0) with strides: (P, 4)
    [x*s, y*s, s, s] concatenated over levels."""
    out = []
    for s in strides:
        fh, fw = -(-img_hw[0] // s), -(-img_hw[1] // s)
        xs = np.arange(fw, dtype=np.float32) * s
        ys = np.arange(fh, dtype=np.float32) * s
        xx, yy = np.meshgrid(xs, ys)
        ss = np.full_like(xx.ravel(), s)
        out.append(np.stack([xx.ravel(), yy.ravel(), ss, ss], axis=-1))
    return np.concatenate(out, axis=0)


def yolox_decode(priors: jnp.ndarray, bbox_preds: jnp.ndarray
                 ) -> jnp.ndarray:
    """``yolox_head.py:295-305`` _bbox_decode: xy offset * stride + point,
    wh = exp * stride; returns xyxy."""
    xys = bbox_preds[..., :2] * priors[..., 2:] + priors[..., :2]
    whs = jnp.exp(bbox_preds[..., 2:]) * priors[..., 2:]
    return jnp.concatenate([xys - whs * 0.5, xys + whs * 0.5], axis=-1)


# ----------------------------------------------------------------- sim OTA
def sim_ota_assign(pred_scores: jnp.ndarray,   # (P, C) sigmoid(cls)*sigmoid(obj)
                   priors: jnp.ndarray,        # (P, 4) [cx, cy, sx, sy]
                   decoded: jnp.ndarray,       # (P, 4) xyxy
                   gt_boxes: jnp.ndarray,      # (G, 4) padded
                   gt_labels: jnp.ndarray,     # (G,)
                   gt_valid: jnp.ndarray,      # (G,) bool
                   num_classes: int,
                   center_radius: float = 2.5,
                   candidate_topk: int = 10,
                   cls_weight: float = 1.0,
                   iou_weight: float = 3.0,
                   eps: float = 1e-7,
                   ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``sim_ota_assigner.py:95-254`` as one static-shape function.
    Returns (fg_mask (P,), matched_gt_idx (P,), matched_iou (P,));
    matched_gt_idx is only meaningful where fg_mask."""
    num_p, num_gt = priors.shape[0], gt_boxes.shape[0]
    px, py = priors[:, 0:1], priors[:, 1:2]
    sx, sy = priors[:, 2:3], priors[:, 3:4]

    in_gts = jnp.minimum(
        jnp.minimum(px - gt_boxes[None, :, 0], py - gt_boxes[None, :, 1]),
        jnp.minimum(gt_boxes[None, :, 2] - px, gt_boxes[None, :, 3] - py),
    ) > 0                                                      # (P, G)
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    in_cts = ((px > gcx[None] - center_radius * sx)
              & (px < gcx[None] + center_radius * sx)
              & (py > gcy[None] - center_radius * sy)
              & (py < gcy[None] + center_radius * sy))         # (P, G)
    in_gts = in_gts & gt_valid[None, :]
    in_cts = in_cts & gt_valid[None, :]
    valid_prior = (in_gts | in_cts).any(axis=1)                # (P,)
    in_both = in_gts & in_cts

    iou = bbox_overlaps(decoded, gt_boxes)                     # (P, G)
    iou = jnp.where(valid_prior[:, None] & gt_valid[None, :], iou, 0.0)
    iou_cost = -jnp.log(iou + eps)

    onehot = jax.nn.one_hot(gt_labels, num_classes)            # (G, C)
    sq = jnp.sqrt(jnp.clip(pred_scores, 0.0, 1.0))
    sq = jnp.clip(sq, 1e-8, 1.0 - 1e-8)
    # BCE(sqrt(p), onehot) summed over classes, for every (prior, gt)
    # pair: sum_c -[y log q + (1-y) log(1-q)] with y one-hot ->
    # -log(q_label) + log(1-q_label) - sum_c log(1-q_c) ... expanded via
    # matmul so the (P, G, C) tensor is never materialized (MXU-sized)
    log_q = jnp.log(sq)                                        # (P, C)
    log_1q = jnp.log(1.0 - sq)
    cls_cost = (-(log_q - log_1q) @ onehot.T) - log_1q.sum(-1, keepdims=True)

    # the reference's cost matrix spans only valid (in gt or in center)
    # priors; out-of-center-but-valid candidates carry +INF and CAN still
    # be selected when dynamic_k exceeds the in-both count. Invalid
    # priors are excluded outright -> emulate with a strictly larger 2INF
    # so they always rank after every in-matrix candidate.
    cost = (cls_weight * cls_cost + iou_weight * iou_cost
            + jnp.where(in_both, 0.0, _INF)
            + jnp.where(valid_prior[:, None], 0.0, 2.0 * _INF))

    # dynamic-k: clamp(int(sum of top-10 ious per gt), min 1); padded
    # gts get k=0 so they never claim a prior
    k_count = min(candidate_topk, num_p)
    topk_ious = jax.lax.top_k(iou.T, k_count)[0]               # (G, k)
    dynamic_ks = jnp.where(
        gt_valid, jnp.maximum(topk_ious.sum(-1).astype(jnp.int32), 1), 0)

    # per-gt: positives = priors whose cost ranks < dynamic_k
    order = jnp.argsort(cost, axis=0)                          # (P, G)
    ranks = jnp.zeros((num_p, num_gt), jnp.int32)
    ranks = ranks.at[order, jnp.arange(num_gt)[None, :]].set(
        jnp.arange(num_p, dtype=jnp.int32)[:, None])
    matching = (ranks < dynamic_ks[None, :]) & (cost < 1.5 * _INF)

    # conflicts: a prior matched to >1 gts keeps its min-cost gt
    row_sum = matching.sum(axis=1)
    argmin_cost = cost.argmin(axis=1)
    fix = jax.nn.one_hot(argmin_cost, num_gt, dtype=bool)
    matching = jnp.where((row_sum > 1)[:, None], fix, matching)

    fg = matching.any(axis=1)
    matched_gt = matching.argmax(axis=1)
    # belt-and-braces: a conflict argmin can in principle land on a
    # padded gt when every real cost is saturated — drop such matches
    fg = fg & gt_valid[matched_gt]
    matched_iou = (matching * iou).sum(axis=1)
    return fg, matched_gt, matched_iou


# -------------------------------------------------------------------- loss
def _bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def yolox_loss(
    model: YOLOX,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: Any = None,                # uniform API (knobs below)
    use_l1: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``yolox_head.py:321-406`` loss: obj BCE over all priors, IoU-aware
    cls BCE + squared-IoU bbox loss (weight 5) over SimOTA positives, all
    / batch-total positives; optional L1 (the last-15-epochs hook)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    (cls_scores, bbox_preds, objectnesses), mutated = model.apply(
        variables, images, True, mutable=["batch_stats"])
    c = model.num_classes
    flat_cls = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1).astype(jnp.float32)
    flat_reg = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1).astype(jnp.float32)
    flat_obj = jnp.concatenate(
        [o.reshape(b, -1) for o in objectnesses], axis=1).astype(jnp.float32)

    priors = jnp.asarray(yolox_priors((img_h, img_w)))
    # assignment uses centers offset by stride/2; regression uses raw
    # grid corners (`yolox_head.py:443-446`)
    offset_priors = jnp.concatenate(
        [priors[:, :2] + priors[:, 2:] * 0.5, priors[:, 2:]], axis=-1)
    decoded = yolox_decode(priors[None], flat_reg)             # (B, P, 4)

    def _one(cls_p, reg_p, obj_p, dec, gtb, gtl, gtv):
        scores = (jax.nn.sigmoid(jax.lax.stop_gradient(cls_p))
                  * jax.nn.sigmoid(jax.lax.stop_gradient(obj_p))[:, None])
        fg, m_gt, m_iou = sim_ota_assign(
            scores, offset_priors, jax.lax.stop_gradient(dec),
            gtb, gtl, gtv, c)
        cls_tgt = (jax.nn.one_hot(gtl[m_gt], c) * m_iou[:, None])
        l_cls = (_bce(cls_p, cls_tgt).sum(-1) * fg).sum()
        l_obj = _bce(obj_p, fg.astype(jnp.float32)).sum()
        gt_of = gtb[m_gt]
        # IoULoss mode='square': 1 - iou^2 (yolox config, iou_loss.py)
        lt = jnp.maximum(dec[:, :2], gt_of[:, :2])
        rb = jnp.minimum(dec[:, 2:], gt_of[:, 2:])
        wh = jnp.clip(rb - lt, 0.0)
        inter = wh[:, 0] * wh[:, 1]
        area_p = jnp.clip(dec[:, 2] - dec[:, 0], 0) \
            * jnp.clip(dec[:, 3] - dec[:, 1], 0)
        area_g = (gt_of[:, 2] - gt_of[:, 0]) * (gt_of[:, 3] - gt_of[:, 1])
        iou = inter / jnp.maximum(area_p + area_g - inter, 1e-16)
        l_bbox = ((1.0 - iou ** 2) * fg).sum() * 5.0
        l_l1 = jnp.float32(0.0)
        if use_l1:
            gt_cxy = (gt_of[:, :2] + gt_of[:, 2:]) * 0.5
            gt_wh = gt_of[:, 2:] - gt_of[:, :2]
            tgt = jnp.concatenate(
                [(gt_cxy - priors[:, :2]) / priors[:, 2:],
                 jnp.log(gt_wh / priors[:, 2:] + 1e-8)], axis=-1)
            l_l1 = (jnp.abs(reg_p - tgt).sum(-1) * fg).sum()
        return l_cls, l_obj, l_bbox, l_l1, fg.sum()

    lc, lo, lb, ll1, npos = jax.vmap(_one)(
        flat_cls, flat_reg, flat_obj, decoded, batch["gt_boxes"],
        batch["gt_labels"], batch["gt_valid"])
    n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    losses = {"loss_cls": lc.sum() / n, "loss_obj": lo.sum() / n,
              "loss_bbox": lb.sum() / n}
    if use_l1:
        losses["loss_l1"] = ll1.sum() / n
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


YOLOX_TEST_CFG = SSTestCfg(nms_pre=2000, score_thr=0.01, nms_iou=0.65,
                           max_per_img=100)


def yolox_simple_test(
    model: YOLOX,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = YOLOX_TEST_CFG,
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``yolox_head.py:215-318``: scores = sigmoid(cls)*sigmoid(obj),
    single label per prior (argmax), class-offset NMS at 0.65."""
    b, img_h, img_w, _ = images.shape
    cls_scores, bbox_preds, objectnesses = model.apply(
        variables, images, False)
    c = model.num_classes
    flat_cls = jax.nn.sigmoid(jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], 1).astype(jnp.float32))
    flat_reg = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], 1).astype(jnp.float32)
    flat_obj = jax.nn.sigmoid(jnp.concatenate(
        [o.reshape(b, -1) for o in objectnesses], 1).astype(jnp.float32))
    priors = jnp.asarray(yolox_priors((img_h, img_w)))
    boxes = yolox_decode(priors[None], flat_reg)

    def _one(bx, sc, ob):
        max_s = sc.max(-1) * ob
        labels = sc.argmax(-1)
        k = min(cfg.nms_pre, max_s.shape[0])
        top_s, top_i = jax.lax.top_k(
            jnp.where(max_s >= cfg.score_thr, max_s, -jnp.inf), k)
        bxs, lbs = bx[top_i], labels[top_i]
        keep, order = batched_nms(bxs, top_s, lbs, cfg.nms_iou)
        kept = jnp.where(keep, top_s[order], -jnp.inf)
        out_s, oi = jax.lax.top_k(kept, min(cfg.max_per_img, k))
        sel = order[oi]
        valid = out_s > 0
        return (jnp.where(valid[:, None], bxs[sel], 0.0),
                jnp.where(valid, out_s, 0.0),
                jnp.where(valid, lbs[sel], -1), valid)

    dets, out_scores, labels, det_valid = jax.vmap(_one)(
        boxes, flat_cls, flat_obj)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}
