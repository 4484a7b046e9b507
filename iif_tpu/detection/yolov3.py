"""YOLOv3 detector (Darknet-53 + YOLOV3Neck + YOLOV3Head), static-shape.

Rebuild of the reference's YOLO family
(``configs/yolo/yolov3_d53_mstrain-608_273e_coco.py``, backbone
``mmdet/models/backbones/darknet.py``, neck
``mmdet/models/necks/yolo_neck.py``, head
``mmdet/models/dense_heads/yolo_head.py``, coder
``mmdet/core/bbox/coder/yolo_bbox_coder.py``, assigner
``mmdet/core/bbox/assigners/grid_assigner.py``, anchors
``mmdet/core/anchor/anchor_generator.py:710-858`` YOLOAnchorGenerator):

- Darknet-53: 3x3 stem + 5 stages of (stride-2 conv, n residual 1x1/3x3
  blocks) with n = (1, 2, 8, 8, 4); BN + LeakyReLU(0.1); outputs C3-C5.
- Neck: DetectionBlock(5 alternating 1x1/3x3 convs) per scale, top-down
  1x1+upsample+concat.
- Head: per-level 3x3 bridge + 1x1 predictor of A*(5+C); targets are the
  YOLO grid encoding (sigmoid xy offsets in the responsible cell, log wh
  vs the anchor box), losses BCE(cls/conf/xy) + MSE(wh) with the
  reference's sum reduction and weights (2.0 on xy/wh).
- GridAssigner: negatives below IoU 0.5, positives above 0.5 among the
  RESPONSIBLE anchors (the 3 anchors of the grid cell containing the gt
  center), plus best-anchor-per-gt forcing — all reproduced as one
  vectorized static-shape function.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.single_stage import SSTestCfg, _SingleStageBase
from iif_tpu.ops.boxes import bbox_overlaps
from iif_tpu.ops.nms import multiclass_nms

kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

YOLO_STRIDES = (32, 16, 8)
# (w, h) anchor sizes per level, large -> small stride
# (yolov3_d53 config anchor_generator.base_sizes)
YOLO_BASE_SIZES = (((116, 90), (156, 198), (373, 326)),
                   ((30, 61), (62, 45), (59, 119)),
                   ((10, 13), (16, 30), (33, 23)))


class ConvBNLeaky(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=(self.kernel - 1) // 2, use_bias=False,
                    kernel_init=kaiming_normal, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.leaky_relu(x, 0.1)


class DarknetResBlock(nn.Module):
    """1x1 half-channels + 3x3 restore + identity (``darknet.py``
    ResBlock)."""
    channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = ConvBNLeaky(self.channels // 2, 1, dtype=self.dtype,
                          name="conv1")(x, train)
        out = ConvBNLeaky(self.channels, 3, dtype=self.dtype,
                          name="conv2")(out, train)
        return out + x


class Darknet53(nn.Module):
    """``darknet.py`` depth-53: layers (1, 2, 8, 8, 4), channels
    (64, 128, 256, 512, 1024), out_indices (3, 4, 5) -> C3/C4/C5."""
    out_indices: Sequence[int] = (3, 4, 5)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = True) -> List[jnp.ndarray]:
        x = ConvBNLeaky(32, 3, dtype=self.dtype, name="stem")(x, train)
        outs = []
        for stage, (n, ch) in enumerate(
                zip((1, 2, 8, 8, 4), (64, 128, 256, 512, 1024)), start=1):
            x = ConvBNLeaky(ch, 3, stride=2, dtype=self.dtype,
                            name=f"stage{stage}_down")(x, train)
            for i in range(n):
                x = DarknetResBlock(ch, dtype=self.dtype,
                                    name=f"stage{stage}_block{i}")(x, train)
            if stage in self.out_indices:
                outs.append(x)
        return outs


class DetectionBlock(nn.Module):
    """5 alternating 1x1/3x3 convs (``yolo_neck.py`` DetectionBlock)."""
    out_channels: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.out_channels
        for i, (ch, k) in enumerate(((c, 1), (c * 2, 3), (c, 1),
                                     (c * 2, 3), (c, 1))):
            x = ConvBNLeaky(ch, k, dtype=self.dtype,
                            name=f"conv{i + 1}")(x, train)
        return x


class YOLOV3Neck(nn.Module):
    """``yolo_neck.py:94-135``: detect1 on C5; 1x1 + 2x upsample + concat
    with the next lower feature, then another DetectionBlock. Outputs
    (out32, out16, out8)."""
    out_channels: Sequence[int] = (512, 256, 128)
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        # feats = [C3 (/8), C4 (/16), C5 (/32)]
        outs = []
        out = DetectionBlock(self.out_channels[0], dtype=self.dtype,
                             name="detect1")(feats[-1], train)
        outs.append(out)
        for i in range(1, len(self.out_channels)):
            tmp = ConvBNLeaky(self.out_channels[i], 1, dtype=self.dtype,
                              name=f"conv{i}")(out, train)
            tmp = jnp.repeat(jnp.repeat(tmp, 2, axis=1), 2, axis=2)
            low = feats[-1 - i]
            tmp = tmp[:, :low.shape[1], :low.shape[2]]
            cat = jnp.concatenate([tmp, low], axis=-1)
            out = DetectionBlock(self.out_channels[i], dtype=self.dtype,
                                 name=f"detect{i + 1}")(cat, train)
            outs.append(out)
        return outs


class YOLOV3Head(nn.Module):
    """``yolo_head.py:134-187``: per-level 3x3 bridge (to 1024/512/256)
    + 1x1 predictor of A*(5+C)."""
    num_classes: int
    bridge_channels: Sequence[int] = (1024, 512, 256)
    num_anchors: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> List[jnp.ndarray]:
        preds = []
        attrib = 5 + self.num_classes
        for i, x in enumerate(feats):
            x = ConvBNLeaky(self.bridge_channels[i], 3, dtype=self.dtype,
                            name=f"bridge_{i}")(x, train)
            preds.append(nn.Conv(self.num_anchors * attrib, (1, 1),
                                 kernel_init=kaiming_normal,
                                 dtype=self.dtype,
                                 name=f"pred_{i}")(x))
        return preds


class YOLOV3(_SingleStageBase):
    """YOLOv3-D53 (``yolov3_d53_mstrain-608_273e_coco.py``)."""

    def setup(self):
        self.backbone = Darknet53(dtype=self.compute_dtype, name="backbone")
        self.neck = YOLOV3Neck(dtype=self.compute_dtype, name="neck")
        self.head = YOLOV3Head(self.num_classes, dtype=self.compute_dtype,
                               name="bbox_head")

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        from iif_tpu.detection.detector import normalize_if_uint8

        feats = self.backbone(normalize_if_uint8(images), train=train)
        return self.neck(feats, train=train)

    def forward_head(self, feats, train: bool = False):
        return self.head(feats, train=train)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        return self.forward_head(self.extract_feat(images, train), train)


# ----------------------------------------------------------------- anchors
def yolo_feat_shapes(img_hw: Tuple[int, int]) -> List[Tuple[int, int]]:
    return [(-(-img_hw[0] // s), -(-img_hw[1] // s)) for s in YOLO_STRIDES]


def yolo_grid_anchors(img_hw: Tuple[int, int]) -> List[np.ndarray]:
    """YOLOAnchorGenerator: explicit (w, h) base sizes centered at
    stride/2 on each cell."""
    out = []
    for (fh, fw), stride, sizes in zip(yolo_feat_shapes(img_hw),
                                       YOLO_STRIDES, YOLO_BASE_SIZES):
        base = []
        for w, h in sizes:
            cx = cy = stride / 2.0
            base.append([cx - w / 2.0, cy - h / 2.0,
                         cx + w / 2.0, cy + h / 2.0])
        base = np.asarray(base, np.float32)                 # (A, 4)
        xs = np.arange(fw, dtype=np.float32) * stride
        ys = np.arange(fh, dtype=np.float32) * stride
        xx, yy = np.meshgrid(xs, ys)
        shifts = np.stack([xx.ravel(), yy.ravel(),
                           xx.ravel(), yy.ravel()], axis=-1)
        out.append((base[None] + shifts[:, None]).reshape(-1, 4)
                   .astype(np.float32))
    return out


def yolo_responsible_flags(img_hw: Tuple[int, int],
                           gt_boxes: jnp.ndarray,
                           gt_valid: jnp.ndarray) -> jnp.ndarray:
    """``anchor_generator.py:822-858``: for each level, flag every base
    anchor of the grid cell containing a (valid) gt center. (N_total,)
    bool, level-concatenated."""
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
    flags = []
    for (fh, fw), stride, sizes in zip(yolo_feat_shapes(img_hw),
                                       YOLO_STRIDES, YOLO_BASE_SIZES):
        gx = jnp.clip(jnp.floor(cx / stride).astype(jnp.int32), 0, fw - 1)
        gy = jnp.clip(jnp.floor(cy / stride).astype(jnp.int32), 0, fh - 1)
        idx = gy * fw + gx
        grid = jnp.zeros(fh * fw, jnp.int32).at[idx].max(
            gt_valid.astype(jnp.int32))
        flags.append(jnp.repeat(grid > 0, len(sizes)))
    return jnp.concatenate(flags)


def grid_assign(anchors: jnp.ndarray,          # (N, 4)
                responsible: jnp.ndarray,      # (N,) bool
                gt_boxes: jnp.ndarray,         # (G, 4) padded
                gt_valid: jnp.ndarray,         # (G,) bool
                pos_iou_thr: float = 0.5,
                neg_iou_thr: float = 0.5,
                min_pos_iou: float = 0.0) -> jnp.ndarray:
    """``grid_assigner.py:40-170`` vectorized: returns (N,) with mmdet's
    convention (-1 ignore, 0 negative, g+1 positive)."""
    iou = bbox_overlaps(gt_boxes, anchors)                 # (G, N)
    iou = jnp.where(gt_valid[:, None], iou, 0.0)
    max_all = iou.max(axis=0)
    assigned = jnp.full(anchors.shape[0], -1, jnp.int32)
    assigned = jnp.where(max_all <= neg_iou_thr, 0, assigned)

    # responsible-only IoUs for the positive steps
    iou_r = jnp.where(responsible[None, :], iou, -1.0)
    iou_r = jnp.where(gt_valid[:, None], iou_r, -1.0)
    max_r = iou_r.max(axis=0)
    arg_r = iou_r.argmax(axis=0).astype(jnp.int32)
    pos = (max_r > pos_iou_thr) & responsible
    assigned = jnp.where(pos, arg_r + 1, assigned)

    # best responsible anchor per gt claims it (ties included,
    # gt_max_assign_all=True; reference loop order -> last gt wins)
    gt_max = iou_r.max(axis=1)                             # (G,)
    ok = (gt_max > min_pos_iou) & gt_valid
    claim = (iou_r == gt_max[:, None]) & ok[:, None] & responsible[None, :]
    g_idx = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32) + 1
    last = jnp.where(claim, g_idx[:, None], 0).max(axis=0)
    return jnp.where(last > 0, last, assigned)


def yolo_encode(anchors: jnp.ndarray, gts: jnp.ndarray,
                strides: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """``yolo_bbox_coder.py`` encode: sigmoid-space xy cell offsets +
    log wh ratios."""
    acx = (anchors[:, 0] + anchors[:, 2]) * 0.5
    acy = (anchors[:, 1] + anchors[:, 3]) * 0.5
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    gcx = (gts[:, 0] + gts[:, 2]) * 0.5
    gcy = (gts[:, 1] + gts[:, 3]) * 0.5
    gw = gts[:, 2] - gts[:, 0]
    gh = gts[:, 3] - gts[:, 1]
    tx = jnp.clip((gcx - acx) / strides + 0.5, eps, 1 - eps)
    ty = jnp.clip((gcy - acy) / strides + 0.5, eps, 1 - eps)
    tw = jnp.log(jnp.clip(gw / jnp.maximum(aw, eps), eps))
    th = jnp.log(jnp.clip(gh / jnp.maximum(ah, eps), eps))
    return jnp.stack([tx, ty, tw, th], axis=-1)


def yolo_decode(anchors: jnp.ndarray, pred: jnp.ndarray,
                strides: jnp.ndarray) -> jnp.ndarray:
    """``yolo_bbox_coder.py`` decode; ``pred[..., :2]`` already
    sigmoided."""
    acx = (anchors[..., 0] + anchors[..., 2]) * 0.5
    acy = (anchors[..., 1] + anchors[..., 3]) * 0.5
    aw2 = (anchors[..., 2] - anchors[..., 0]) * 0.5
    ah2 = (anchors[..., 3] - anchors[..., 1]) * 0.5
    cx = acx + (pred[..., 0] - 0.5) * strides
    cy = acy + (pred[..., 1] - 0.5) * strides
    w2 = aw2 * jnp.exp(pred[..., 2])
    h2 = ah2 * jnp.exp(pred[..., 3])
    return jnp.stack([cx - w2, cy - h2, cx + w2, cy + h2], axis=-1)


def _bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


# -------------------------------------------------------------------- loss
def yolov3_loss(
    model: YOLOV3,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: Any = None,                # uniform API
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``yolo_head.py:282-375``: BCE cls/conf/xy (weights 1/1/2) + MSE wh
    (weight 2), sum reduction over positives (negatives contribute to
    conf only)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    pred_maps, mutated = model.apply(
        variables, images, True, mutable=["batch_stats"])
    c = model.num_classes
    attrib = 5 + c
    preds = jnp.concatenate(
        [p.reshape(b, -1, attrib) for p in pred_maps],
        axis=1).astype(jnp.float32)                    # (B, N, 5+C)
    anchors_np = yolo_grid_anchors((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(anchors_np))
    strides = jnp.asarray(np.concatenate(
        [np.full(a.shape[0], s, np.float32)
         for a, s in zip(anchors_np, YOLO_STRIDES)]))

    def _one(pred, gtb, gtl, gtv):
        resp = yolo_responsible_flags((img_h, img_w), gtb, gtv)
        assigned = grid_assign(anchors, resp, gtb, gtv)
        is_pos = assigned > 0
        is_neg = assigned == 0
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        tgt_box = yolo_encode(anchors, gtb[gt_idx], strides)
        tgt_cls = jax.nn.one_hot(gtl[gt_idx], c)
        posf = is_pos.astype(jnp.float32)
        pnf = jnp.clip(posf + is_neg.astype(jnp.float32), 0.0, 1.0)
        l_cls = (_bce(pred[:, 5:], tgt_cls).sum(-1) * posf).sum()
        l_conf = (_bce(pred[:, 4], posf) * pnf).sum()
        l_xy = (_bce(pred[:, :2], tgt_box[:, :2]).sum(-1) * posf).sum() \
            * 2.0
        l_wh = (((pred[:, 2:4] - tgt_box[:, 2:4]) ** 2).sum(-1)
                * posf).sum() * 2.0
        return l_cls, l_conf, l_xy, l_wh

    lc, lconf, lxy, lwh = jax.vmap(_one)(
        preds, batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    losses = {"loss_cls": lc.sum(), "loss_conf": lconf.sum(),
              "loss_xy": lxy.sum(), "loss_wh": lwh.sum()}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


YOLOV3_TEST_CFG = SSTestCfg(nms_pre=1000, score_thr=0.05, nms_iou=0.45,
                            max_per_img=100)


def yolov3_simple_test(
    model: YOLOV3,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = YOLOV3_TEST_CFG,
    scale_factor: Optional[jnp.ndarray] = None,
    conf_thr: float = 0.005,
) -> Dict[str, jnp.ndarray]:
    """``yolo_head.py:191-279``: sigmoid xy/conf/cls, YOLO decode,
    conf_thr gate, objectness-scaled multiclass NMS."""
    b, img_h, img_w, _ = images.shape
    pred_maps = model.apply(variables, images, False)
    c = model.num_classes
    attrib = 5 + c
    preds = jnp.concatenate(
        [p.reshape(b, -1, attrib) for p in pred_maps],
        axis=1).astype(jnp.float32)
    anchors_np = yolo_grid_anchors((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(anchors_np))
    strides = jnp.asarray(np.concatenate(
        [np.full(a.shape[0], s, np.float32)
         for a, s in zip(anchors_np, YOLO_STRIDES)]))

    xy = jax.nn.sigmoid(preds[..., :2])
    boxes = yolo_decode(anchors[None], jnp.concatenate(
        [xy, preds[..., 2:4]], -1), strides[None])
    conf = jax.nn.sigmoid(preds[..., 4])
    cls = jax.nn.sigmoid(preds[..., 5:])

    def _one(bx, sc, ob):
        gate = ob >= conf_thr
        scored = sc * ob[:, None] * gate[:, None]
        k = min(cfg.nms_pre, scored.shape[0])
        top_i = jax.lax.top_k(scored.max(-1), k)[1]
        padded = jnp.concatenate(
            [scored[top_i],
             jnp.zeros((k, 1), scored.dtype)], axis=1)
        return multiclass_nms(bx[top_i], padded, cfg.score_thr,
                              cfg.nms_iou, cfg.max_per_img)

    dets, out_scores, labels, det_valid = jax.vmap(_one)(boxes, cls, conf)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}
