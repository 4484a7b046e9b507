"""CenterNet detector (ResNet + deconv neck + heatmap head),
static-shape.

Rebuild of the reference's CenterNet family
(``configs/centernet/centernet_resnet18_140e_coco.py``, neck
``mmdet/models/necks/ct_resnet_neck.py``, head
``mmdet/models/dense_heads/centernet_head.py``, gaussian utilities
``mmdet/models/utils/gaussian_target.py``):

- ResNet trunk -> 3 (conv3x3 + BN + relu, deconv4x4/s2 + BN + relu)
  stages to a stride-4 64-channel map (the reference's DCNv2 convs are
  plain 3x3 here — deformable conv is an explicitly deferred native op,
  SURVEY §2.4) -> three small heads: C-class center heatmap (sigmoid,
  bias at the 0.1 prior), wh (2), offset (2).
- Targets: per-gt CornerNet gaussian radius (3-case quadratic,
  min_overlap 0.3) stamped as a max-composited gaussian; wh/offset
  regressed at the integer center cell only. The reference's per-gt
  python stamping loop becomes full-grid gaussians max-scattered by
  class — one vectorized op, no host loop.
- Losses: Gaussian focal (alpha 2, beta 4) / num centers, L1 wh x0.1
  and L1 offset, each / (2 * num centers).
- Decode: 3x3 local-maximum gate, global top-k over (C, H, W), offset
  add, scale to image coords. No NMS (the reference default).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.single_stage import (
    SSTestCfg,
    _DEPTH_LAYERS,
    _SingleStageBase,
    bias_init_with_prob,
    normal_init,
)
from iif_tpu.models.resnet import ResNet


class CTResNetNeck(nn.Module):
    """``ct_resnet_neck.py``: per stage conv3x3+BN+relu then
    deconv4x4/s2+BN+relu; channels (256, 128, 64)."""
    filters: Tuple[int, ...] = (256, 128, 64)
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, ch in enumerate(self.filters):
            x = nn.Conv(ch, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     name=f"conv_bn_{i}")(x))
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 dtype=self.dtype, name=f"deconv_{i}")(x)
            x = nn.relu(nn.BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     dtype=self.dtype,
                                     name=f"deconv_bn_{i}")(x))
        return x


class CenterNetHead(nn.Module):
    """``centernet_head.py:38-115``: each branch = conv3x3(feat 64) +
    relu + 1x1; heatmap bias initialized to the 0.1 prior."""
    num_classes: int
    feat_channels: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, feat: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        def branch(out_ch, name, bias_init=None):
            h = nn.relu(nn.Conv(self.feat_channels, (3, 3), padding=1,
                                kernel_init=normal_init, dtype=self.dtype,
                                name=f"{name}_conv")(feat))
            kw = {}
            if bias_init is not None:
                kw["bias_init"] = nn.initializers.constant(bias_init)
            return nn.Conv(out_ch, (1, 1), kernel_init=normal_init,
                           dtype=self.dtype, name=f"{name}_out",
                           **kw)(h)

        heatmap = jax.nn.sigmoid(
            branch(self.num_classes, "heatmap",
                   bias_init_with_prob(0.1)).astype(jnp.float32))
        wh = branch(2, "wh").astype(jnp.float32)
        offset = branch(2, "offset").astype(jnp.float32)
        return heatmap, wh, offset


class CenterNet(_SingleStageBase):
    """CenterNet-R18 (``centernet_resnet18_140e_coco.py``; norm_eval off,
    no frozen stages in the reference config)."""

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = CTResNetNeck(dtype=self.compute_dtype, name="neck")
        self.head = CenterNetHead(self.num_classes,
                                  dtype=self.compute_dtype,
                                  name="bbox_head")

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        from iif_tpu.detection.detector import normalize_if_uint8

        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        return self.neck(feats[-1], train=train)

    def forward_head(self, feat, train: bool = False):
        return self.head(feat)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        return self.head(self.extract_feat(images, train))


# ------------------------------------------------------------------ targets
def gaussian_radius(h: jnp.ndarray, w: jnp.ndarray,
                    min_overlap: float = 0.3) -> jnp.ndarray:
    """``gaussian_target.py:68-178``: min of the three CornerNet
    quadratic-case radii."""
    a1 = 1.0
    b1 = h + w
    c1 = w * h * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * a1 * c1, 0))) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (h + w)
    c2 = (1 - min_overlap) * w * h
    r2 = (b2 - jnp.sqrt(jnp.maximum(b2 ** 2 - 4 * a2 * c2, 0))) / (2 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (h + w)
    c3 = (min_overlap - 1) * w * h
    r3 = (-b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


def centernet_targets(gt_boxes: jnp.ndarray,    # (G, 4) image coords
                      gt_labels: jnp.ndarray,   # (G,)
                      gt_valid: jnp.ndarray,    # (G,)
                      num_classes: int,
                      feat_hw: Tuple[int, int],
                      img_hw: Tuple[int, int],
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                 jnp.ndarray]:
    """``centernet_head.py:181-250`` for one image, fully vectorized:
    (heatmap (C, H, W), wh (H, W, 2), offset (H, W, 2), weight (H, W)).
    Invalid gts write into a padded sentinel row that is cropped off."""
    fh, fw = feat_hw
    wr = fw / img_hw[1]
    hr = fh / img_hw[0]
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * wr / 2.0
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * hr / 2.0
    cxi = cx.astype(jnp.int32)
    cyi = cy.astype(jnp.int32)
    bw = (gt_boxes[:, 2] - gt_boxes[:, 0]) * wr
    bh = (gt_boxes[:, 3] - gt_boxes[:, 1]) * hr
    radius = jnp.maximum(
        jnp.floor(gaussian_radius(bh, bw)).astype(jnp.int32), 0)

    # full-grid gaussian per gt, cropped to the (2r+1) window and the
    # reference's eps threshold (gaussian2D: kill h < eps since max==1)
    xs = jnp.arange(fw)[None, None, :]
    ys = jnp.arange(fh)[None, :, None]
    dx = xs - cxi[:, None, None]
    dy = ys - cyi[:, None, None]
    diameter = (2 * radius + 1).astype(jnp.float32)
    sigma = diameter / 6.0
    g = jnp.exp(-(dx ** 2 + dy ** 2)
                / (2.0 * sigma[:, None, None] ** 2))
    inside = ((jnp.abs(dx) <= radius[:, None, None])
              & (jnp.abs(dy) <= radius[:, None, None])
              & gt_valid[:, None, None])
    g = jnp.where(inside & (g >= 1.19e-7), g, 0.0)         # (G, H, W)
    heatmap = jnp.zeros((num_classes, fh, fw))
    heatmap = heatmap.at[jnp.clip(gt_labels, 0, num_classes - 1)].max(g)

    # wh/offset/weight at the integer centers; invalid gts write to the
    # sentinel row fh (cropped afterwards)
    wy = jnp.where(gt_valid, cyi, fh)
    wx = jnp.where(gt_valid, cxi, 0)
    wh = jnp.zeros((fh + 1, fw, 2)).at[wy, wx].set(
        jnp.stack([bw, bh], -1))[:fh]
    offset = jnp.zeros((fh + 1, fw, 2)).at[wy, wx].set(
        jnp.stack([cx - cxi, cy - cyi], -1))[:fh]
    weight = jnp.zeros((fh + 1, fw)).at[wy, wx].set(
        gt_valid.astype(jnp.float32))[:fh]
    return heatmap, wh, offset, weight


def gaussian_focal_loss(pred: jnp.ndarray, target: jnp.ndarray,
                        alpha: float = 2.0, gamma: float = 4.0,
                        eps: float = 1e-12) -> jnp.ndarray:
    """mmdet ``GaussianFocalLoss``: positives where target == 1."""
    pos = (target == 1.0).astype(pred.dtype)
    neg = 1.0 - pos
    pos_loss = -jnp.log(pred + eps) * (1 - pred) ** alpha * pos
    neg_loss = (-jnp.log(1 - pred + eps) * pred ** alpha
                * (1 - target) ** gamma * neg)
    return pos_loss + neg_loss


# -------------------------------------------------------------------- loss
def centernet_loss(
    model: CenterNet,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: Any = None,                # uniform API
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``centernet_head.py:116-180``: gaussian focal / num centers, L1
    wh x0.1 and offset / (2 * num centers)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    (heatmap, wh, offset), mutated = model.apply(
        variables, images, True, mutable=["batch_stats"])
    fh, fw = heatmap.shape[1:3]
    c = model.num_classes

    def _one(gtb, gtl, gtv):
        return centernet_targets(gtb, gtl, gtv, c, (fh, fw),
                                 (img_h, img_w))

    hm_t, wh_t, off_t, w_t = jax.vmap(_one)(
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    hm_t = hm_t.transpose(0, 2, 3, 1)                     # (B, H, W, C)
    avg = jnp.maximum((hm_t == 1.0).sum().astype(jnp.float32), 1.0)
    l_center = gaussian_focal_loss(heatmap, hm_t).sum() / avg
    l_wh = (jnp.abs(wh - wh_t) * w_t[..., None]).sum() / (avg * 2) * 0.1
    l_off = (jnp.abs(offset - off_t) * w_t[..., None]).sum() / (avg * 2)
    losses = {"loss_center_heatmap": l_center, "loss_wh": l_wh,
              "loss_offset": l_off}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


CENTERNET_TEST_CFG = SSTestCfg(nms_pre=100, score_thr=0.0, nms_iou=0.5,
                               max_per_img=100)


def centernet_simple_test(
    model: CenterNet,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = CENTERNET_TEST_CFG,
    scale_factor: Optional[jnp.ndarray] = None,
    local_maximum_kernel: int = 3,
) -> Dict[str, jnp.ndarray]:
    """``centernet_head.py:316-366`` decode_heatmap: 3x3 local-max gate,
    top-k over (C, H, W), offset add, wh box, scale to image coords.
    No NMS (reference ``with_nms=False`` default)."""
    b, img_h, img_w, _ = images.shape
    heatmap, wh, offset = model.apply(variables, images, False)
    fh, fw = heatmap.shape[1:3]
    c = model.num_classes
    k = min(cfg.max_per_img, fh * fw * c)

    pad = local_maximum_kernel // 2
    hmax = nn.max_pool(heatmap, (local_maximum_kernel,) * 2,
                       strides=(1, 1), padding=((pad, pad), (pad, pad)))
    heat = jnp.where(hmax == heatmap, heatmap, 0.0)       # (B, H, W, C)

    flat = heat.transpose(0, 3, 1, 2).reshape(b, -1)      # (B, C*H*W)
    scores, idx = jax.lax.top_k(flat, k)
    labels = idx // (fh * fw)
    pix = idx % (fh * fw)
    ys = (pix // fw).astype(jnp.float32)
    xs = (pix % fw).astype(jnp.float32)

    def _gather(maps, pix_i):
        flat_m = maps.reshape(maps.shape[0], -1, maps.shape[-1])
        return jnp.take_along_axis(flat_m, pix_i[..., None], axis=1)

    wh_k = _gather(wh, pix)                               # (B, k, 2)
    off_k = _gather(offset, pix)
    xs = xs + off_k[..., 0]
    ys = ys + off_k[..., 1]
    sx = img_w / fw
    sy = img_h / fh
    boxes = jnp.stack([(xs - wh_k[..., 0] / 2) * sx,
                       (ys - wh_k[..., 1] / 2) * sy,
                       (xs + wh_k[..., 0] / 2) * sx,
                       (ys + wh_k[..., 1] / 2) * sy], axis=-1)
    if scale_factor is not None:
        boxes = boxes / scale_factor[:, None, :]
    return {"boxes": boxes, "scores": scores, "labels": labels,
            "valid": scores > cfg.score_thr}
