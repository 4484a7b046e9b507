"""SSD300 detector (VGG16 backbone), static-shape.

Rebuild of the reference's SSD family
(``configs/_base_/models/ssd300.py``, backbone
``mmdet/models/backbones/ssd_vgg.py``, neck
``mmdet/models/necks/ssd_neck.py``, head
``mmdet/models/dense_heads/ssd_head.py``, anchors
``mmdet/core/anchor/anchor_generator.py:462-591`` SSDAnchorGenerator):

- VGG16 conv trunk with ceil-mode pools, pool5 3x3/s1, dilated conv6
  (rate 6, 1024ch) + conv7 (1x1, 1024ch); features from relu4_3 and
  relu7.
- Neck: learnable per-channel L2Norm (init 20) on conv4_3, then four
  (1x1 half-channel + 3x3) extra pairs with strides (2,2,1,1) /
  paddings (1,1,0,0) -> six maps (38,19,10,5,3,1) for input 300.
- Head: one 3x3 conv pair per level, (C+1)-way softmax CE with 3:1
  hard-negative mining + smooth-L1 on (0.1, 0.2)-std deltas, MaxIoU
  assignment pos/neg 0.5 with single-claim low-quality matching
  (gt_max_assign_all=False).

The reference's per-image hard-negative ``topk(3*num_pos)`` with a
data-dependent k becomes a static-shape rank test: sort all negative CE
losses descending and keep ``rank < 3*num_pos`` — identical selection,
no dynamic shape.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.losses import smooth_l1_loss
from iif_tpu.detection.single_stage import (
    SSTestCfg,
    SSTrainCfg,
    _SingleStageBase,
)
from iif_tpu.losses.ce import softmax_cross_entropy
from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms

xavier_uniform = nn.initializers.xavier_uniform()

SSD_DELTA_STDS = (0.1, 0.1, 0.2, 0.2)
SSD_STRIDES = (8, 16, 32, 64, 100, 300)
# VGG16 ceil-mode feature maps for the canonical 300x300 input
SSD300_FEAT_SIZES = (38, 19, 10, 5, 3, 1)


def _ceil_pool(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/s2 max-pool with ceil_mode=True (``ssd_vgg.py`` make_vgg_layer
    pools): pad bottom/right when the spatial size is odd."""
    h, w = x.shape[1:3]
    pad_h, pad_w = h % 2, w % 2
    return nn.max_pool(x, (2, 2), strides=(2, 2),
                       padding=((0, pad_h), (0, pad_w)))


class SSDVGG(nn.Module):
    """VGG16 trunk (``ssd_vgg.py:13-120``: with_last_pool=False,
    ceil_mode=True, out_feature_indices (22, 34) = relu4_3 and relu7).
    Returns [conv4_3 (512ch, /8), conv7 (1024ch, /16 with ceil)]."""
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = True) -> List[jnp.ndarray]:
        del train  # no norm layers in the caffe VGG trunk
        cfg = ((2, 64), (2, 128), (3, 256), (3, 512))
        feats = []
        for stage, (n, ch) in enumerate(cfg):
            for i in range(n):
                x = nn.relu(nn.Conv(ch, (3, 3), padding=1,
                                    kernel_init=xavier_uniform,
                                    dtype=self.dtype,
                                    name=f"conv{stage + 1}_{i + 1}")(x))
            if stage == 3:
                feats.append(x)          # relu4_3 before pool4
            x = _ceil_pool(x)
        for i in range(3):               # conv5_1..5_3
            x = nn.relu(nn.Conv(512, (3, 3), padding=1,
                                kernel_init=xavier_uniform, dtype=self.dtype,
                                name=f"conv5_{i + 1}")(x))
        # pool5: 3x3 stride 1 pad 1 (`ssd_vgg.py:69`)
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        # conv6: dilated 3x3 rate 6, conv7: 1x1 (the fc6/fc7 conversion)
        x = nn.relu(nn.Conv(1024, (3, 3), padding=6, kernel_dilation=6,
                            kernel_init=xavier_uniform, dtype=self.dtype,
                            name="conv6")(x))
        x = nn.relu(nn.Conv(1024, (1, 1), kernel_init=xavier_uniform,
                            dtype=self.dtype, name="conv7")(x))
        feats.append(x)
        return feats


class L2Norm(nn.Module):
    """Per-channel learnable L2 normalization (``ssd_neck.py`` L2Norm,
    scale init 20)."""
    scale_init: float = 20.0
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale",
                           nn.initializers.constant(self.scale_init),
                           (x.shape[-1],))
        x = x.astype(jnp.float32)
        norm = jnp.sqrt((x * x).sum(-1, keepdims=True)) + self.eps
        return scale * x / norm


class SSDNeck(nn.Module):
    """L2Norm on conv4_3 + four (1x1, 3x3) extra pairs
    (``ssd_neck.py:11-95``; out channels 512/1024/512/256/256/256,
    strides 2/2/1/1, paddings 1/1/0/0)."""
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> List[jnp.ndarray]:
        outs = [L2Norm(name="l2_norm")(feats[0]), feats[1]]
        x = feats[1]
        specs = ((512, 2, 1), (256, 2, 1), (256, 1, 0), (256, 1, 0))
        for i, (ch, stride, pad) in enumerate(specs):
            x = nn.relu(nn.Conv(ch // 2, (1, 1),
                                kernel_init=xavier_uniform, dtype=self.dtype,
                                name=f"extra_{i}_reduce")(x))
            x = nn.relu(nn.Conv(ch, (3, 3), strides=(stride, stride),
                                padding=pad, kernel_init=xavier_uniform,
                                dtype=self.dtype, name=f"extra_{i}_conv")(x))
            outs.append(x)
        return outs


class SSDHead(nn.Module):
    """Per-level 3x3 cls/reg convs (``ssd_head.py:110-202``; softmax head
    -> C+1 output channels per anchor)."""
    num_classes: int
    num_anchors: Sequence[int] = (4, 6, 6, 6, 4, 4)
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        cls_scores, bbox_preds = [], []
        for i, (x, a) in enumerate(zip(feats, self.num_anchors)):
            cls_scores.append(
                nn.Conv(a * (self.num_classes + 1), (3, 3), padding=1,
                        kernel_init=xavier_uniform, dtype=self.dtype,
                        name=f"cls_conv_{i}")(x))
            bbox_preds.append(
                nn.Conv(a * 4, (3, 3), padding=1,
                        kernel_init=xavier_uniform, dtype=self.dtype,
                        name=f"reg_conv_{i}")(x))
        return cls_scores, bbox_preds


class SSD(_SingleStageBase):
    """SSD300-VGG16 (``configs/_base_/models/ssd300.py``). ``depth`` is
    the VGG depth (16, the only reference configuration)."""
    input_size: int = 300

    def setup(self):
        if self.input_size != 300:
            raise NotImplementedError("only SSD300 is configured")
        self.backbone = SSDVGG(dtype=self.compute_dtype, name="backbone")
        self.neck = SSDNeck(dtype=self.compute_dtype, name="neck")
        self.head = SSDHead(self.num_classes, dtype=self.compute_dtype,
                            name="bbox_head")


# ----------------------------------------------------------------- anchors
def ssd_min_max_sizes(input_size: int = 300,
                      basesize_ratio_range: Tuple[float, float] = (0.15, 0.9),
                      num_levels: int = 6) -> Tuple[List[int], List[int]]:
    """The SSDAnchorGenerator hard-coded size schedule
    (``anchor_generator.py:497-541``). For (300, 0.15): min
    [21,45,99,153,207,261], max [45,99,153,207,261,315]."""
    min_ratio = int(basesize_ratio_range[0] * 100)
    max_ratio = int(basesize_ratio_range[1] * 100)
    step = int(math.floor(max_ratio - min_ratio) / (num_levels - 2))
    min_sizes, max_sizes = [], []
    for ratio in range(min_ratio, max_ratio + 1, step):
        min_sizes.append(int(input_size * ratio / 100))
        max_sizes.append(int(input_size * (ratio + step) / 100))
    if input_size == 300 and basesize_ratio_range[0] == 0.15:
        min_sizes.insert(0, int(input_size * 7 / 100))
        max_sizes.insert(0, int(input_size * 15 / 100))
    elif input_size == 300 and basesize_ratio_range[0] == 0.2:
        min_sizes.insert(0, int(input_size * 10 / 100))
        max_sizes.insert(0, int(input_size * 20 / 100))
    else:
        raise NotImplementedError(input_size)
    return min_sizes, max_sizes


SSD_LEVEL_RATIOS = ((2,), (2, 3), (2, 3), (2, 3), (2,), (2,))


def ssd_grid_anchors(input_size: int = 300) -> List[np.ndarray]:
    """Per-level (H*W*A, 4) anchors matching SSDAnchorGenerator
    (scale_major=False + the ``indices.insert(1, ...)`` reorder:
    [min-square, sqrt(min*max)-square, ratio 1/r & r at min size, ...]),
    centers at stride/2."""
    min_sizes, max_sizes = ssd_min_max_sizes(input_size)
    out = []
    for lvl, (stride, fs) in enumerate(zip(SSD_STRIDES, SSD300_FEAT_SIZES)):
        base = float(min_sizes[lvl])
        scales = [1.0, math.sqrt(max_sizes[lvl] / min_sizes[lvl])]
        ratios = [1.0]
        for r in SSD_LEVEL_RATIOS[lvl]:
            ratios += [1.0 / r, float(r)]
        # scale_major=False: rows = scales x ratios
        ws, hs = [], []
        for s in scales:
            for r in ratios:
                hr = math.sqrt(r)
                ws.append(base * s / hr)
                hs.append(base * s * hr)
        ws, hs = np.asarray(ws), np.asarray(hs)
        # keep [scale1-ratio1, scale2-ratio1, scale1-other-ratios...]
        idx = list(range(len(ratios)))
        idx.insert(1, len(ratios))
        ws, hs = ws[idx], hs[idx]
        cx = cy = stride / 2.0
        base_anchors = np.stack([cx - 0.5 * ws, cy - 0.5 * hs,
                                 cx + 0.5 * ws, cy + 0.5 * hs], axis=-1)
        sx = np.arange(fs, dtype=np.float32) * stride
        xx, yy = np.meshgrid(sx, sx)
        shifts = np.stack([xx.ravel(), yy.ravel(),
                           xx.ravel(), yy.ravel()], axis=-1)
        anchors = (base_anchors[None] + shifts[:, None]).reshape(-1, 4)
        out.append(anchors.astype(np.float32))
    return out


# -------------------------------------------------------------------- train
def ssd_loss(
    model: SSD,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(pos_iou_thr=0.5, neg_iou_thr=0.5,
                                 min_pos_iou=0.0),
    neg_pos_ratio: int = 3,
    smoothl1_beta: float = 1.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``ssd_head.py:204-259`` loss: per-image CE with 3:1 hard-negative
    mining + smooth-L1 on positives, both / batch-total positives."""
    images = batch["image"]
    b = images.shape[0]
    feats = model.apply(variables, images, True, method=SSD.extract_feat)
    cls_scores, bbox_preds = model.apply(variables, feats,
                                         method=SSD.forward_head)
    c1 = model.num_classes + 1
    scores = jnp.concatenate(
        [s.reshape(b, -1, c1) for s in cls_scores], axis=1)
    deltas = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1)
    anchors = jnp.asarray(
        np.concatenate(ssd_grid_anchors(model.input_size), axis=0))

    def _one(score, delta, gtb, gtl, gtv):
        assigned, _ = max_iou_assign(
            anchors, gtb, gtv, cfg.pos_iou_thr, cfg.neg_iou_thr,
            cfg.min_pos_iou, gt_max_assign_all=False)
        is_pos = assigned > 0
        is_neg = assigned == 0
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], model.num_classes)
        ce = softmax_cross_entropy(score.astype(jnp.float32), labels)
        npos = is_pos.sum()
        # static-shape hard negative mining: keep the 3*npos largest
        # negative losses (rank test instead of a data-dependent topk)
        neg_ce = jnp.where(is_neg, ce, -jnp.inf)
        order = jnp.argsort(-neg_ce)
        keep_sorted = jnp.arange(ce.shape[0]) < neg_pos_ratio * npos
        neg_keep = jnp.zeros_like(is_neg).at[order].set(keep_sorted) & is_neg
        l_cls = (ce * is_pos).sum() + (ce * neg_keep).sum()
        tgt = bbox2delta(anchors, gtb[gt_idx], stds=SSD_DELTA_STDS)
        l_bbox = (smooth_l1_loss(delta.astype(jnp.float32), tgt,
                                 smoothl1_beta).sum(-1) * is_pos).sum()
        return l_cls, l_bbox, npos

    lc, lb, npos = jax.vmap(_one)(scores, deltas, batch["gt_boxes"],
                                  batch["gt_labels"], batch["gt_valid"])
    n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    losses = {"loss_cls": lc.sum() / n, "loss_bbox": lb.sum() / n}
    total = losses["loss_cls"] + losses["loss_bbox"]
    return total, losses, {"batch_stats": {}}


SSD_TEST_CFG = SSTestCfg(nms_pre=1000, score_thr=0.02, nms_iou=0.45,
                         max_per_img=200)


def ssd_simple_test(
    model: SSD,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSD_TEST_CFG,
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Softmax scores, per-level top-``nms_pre`` by max foreground score,
    delta decode, multiclass NMS (``anchor_head.py`` get_bboxes with
    use_sigmoid_cls=False; ssd300 test_cfg score_thr=0.02, nms 0.45,
    max_per_img=200)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False, method=SSD.extract_feat)
    cls_scores, bbox_preds = model.apply(variables, feats,
                                         method=SSD.forward_head)
    c1 = model.num_classes + 1
    anchors_np = ssd_grid_anchors(model.input_size)

    lvl_boxes, lvl_scores = [], []
    for s, d, anc in zip(cls_scores, bbox_preds, anchors_np):
        s = jax.nn.softmax(s.reshape(b, -1, c1).astype(jnp.float32), -1)
        d = d.reshape(b, -1, 4).astype(jnp.float32)
        anc = jnp.asarray(anc)
        k = min(cfg.nms_pre, s.shape[1])
        if k < s.shape[1]:
            rank = s[..., :-1].max(-1)
            top_i = jax.lax.top_k(rank, k)[1]
            s = jnp.take_along_axis(s, top_i[..., None], axis=1)
            d = jnp.take_along_axis(d, top_i[..., None], axis=1)
            anc_b = jnp.broadcast_to(anc[None], (b,) + anc.shape)
            anc = jnp.take_along_axis(anc_b, top_i[..., None], axis=1)
        else:
            anc = jnp.broadcast_to(anc[None], (b,) + anc.shape)
        lvl_boxes.append(delta2bbox(anc, d, stds=SSD_DELTA_STDS,
                                    max_shape=(img_h, img_w)))
        lvl_scores.append(s)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)

    def _one(bx, sc):
        return multiclass_nms(bx, sc, cfg.score_thr, cfg.nms_iou,
                              cfg.max_per_img)

    dets, out_scores, labels, det_valid = jax.vmap(_one)(boxes, scores)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}
