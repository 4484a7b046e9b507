"""FCN mask head + mask targets + paste-back.

Rebuild of ``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py`` (4x conv
+ 2x deconv + 1x1 per-class mask logits at 28x28; BCE on positive RoIs)
and ``mmdet/core/mask/mask_target.py:7-127`` (GT masks cropped to 28x28
with roi_align). The optional cosine-normalized ``NormedConv2d`` predictor
(``normed_predictor.py:78-124``) is the FASA cos-norm configuration.

Mask pasting (``_do_paste_mask``, ``fcn_mask_head.py:179-343``) becomes a
single fused scale-and-translate per detection — no GPU_MEM_LIMIT chunking
needed; XLA tiles it.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn



class NormedConv2d(nn.Module):
    """1x1 cosine conv: normalized features @ normalized kernels, scaled by
    temperature (``normed_predictor.py:78-124``)."""

    features: int
    temperature: float = 20.0
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), jnp.float32)
        w = w / (jnp.linalg.norm(w, axis=0, keepdims=True) + self.eps)
        xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + self.eps)
        return self.temperature * (xn @ w.astype(x.dtype))


class FCNMaskHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    conv_out_channels: int = 256
    predictor: str = "conv"      # 'conv' | 'normed'
    temperature: float = 20.0
    norm: str = ""               # '' | 'gn' (configs/gn 'gn-all')
    conv_ws: bool = False

    def setup(self):
        from iif_tpu.models.resnet import make_conv

        conv_cls = make_conv(self.conv_ws)
        self.convs = [conv_cls(
            self.conv_out_channels, (3, 3), padding=1,
            use_bias=not self.norm,
            kernel_init=nn.initializers.variance_scaling(
                2.0, "fan_out", "normal"),
            name=f"conv{i}") for i in range(self.num_convs)]
        if self.norm == "gn":
            self.gns = [nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                     name=f"gn{i}")
                        for i in range(self.num_convs)]
        self.upsample = nn.ConvTranspose(
            self.conv_out_channels, (2, 2), strides=(2, 2), name="upsample")
        if self.predictor == "normed":
            self.conv_logits = NormedConv2d(
                self.num_classes, temperature=self.temperature,
                name="conv_logits")
        else:
            self.conv_logits = nn.Conv(
                self.num_classes, (1, 1),
                kernel_init=nn.initializers.normal(0.001),
                name="conv_logits")

    def features(self, x: jnp.ndarray) -> jnp.ndarray:
        """(R, 14, 14, C_in) -> pre-logit features (R, 28, 28, C)."""
        for i, conv in enumerate(self.convs):
            x = conv(x)
            if self.norm == "gn":
                x = self.gns[i](x)
            x = nn.relu(x)
        return nn.relu(self.upsample(x))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(R, 14, 14, C_in) -> mask logits (R, 28, 28, num_classes)."""
        return self.conv_logits(self.features(x))

    def logits_for_labels(self, x: jnp.ndarray, labels: jnp.ndarray
                          ) -> jnp.ndarray:
        """Inference fast path: compute ONLY each RoI's predicted-class
        mask channel. At LVIS scale the full (R, 28, 28, 1203) logits are
        ~1.1 GB and 72 GFLOPs of 1x1 conv; gathering the per-RoI class
        filter first makes the final layer R x (28*28) x C dots."""
        feats = self.features(x)                    # (R, S, S, C)
        # both predictors expose a (.., C_in, num_classes) kernel
        params = self.conv_logits.variables["params"]
        kernel = params["kernel"]
        if kernel.ndim == 4:          # plain 1x1 conv: (1, 1, C, num_cls)
            kernel2d = kernel[0, 0]
        else:                         # NormedConv2d: (C, num_cls)
            kernel2d = kernel / (jnp.linalg.norm(
                kernel, axis=0, keepdims=True) + 1e-12)
        sel = kernel2d.T[labels]                    # (R, C)
        if self.predictor == "normed":
            feats = feats / (jnp.linalg.norm(
                feats, axis=-1, keepdims=True) + 1e-12)
            sel = sel * self.temperature
        out = jnp.einsum("rhwc,rc->rhw", feats, sel.astype(feats.dtype))
        if kernel.ndim == 4 and "bias" in params:
            out = out + params["bias"][labels][:, None, None]
        return out


class MaskIoUHead(nn.Module):
    """Mask-IoU regressor of Mask Scoring R-CNN (reference
    ``mmdet/models/roi_heads/mask_heads/maskiou_head.py:13-96``): the
    sigmoid mask prediction is 2x2-max-pooled and concatenated onto the
    14x14 RoI features as an extra channel, then 4 convs (last stride 2)
    -> 2 FCs -> per-class mask-IoU scores."""

    num_classes: int
    num_convs: int = 4
    num_fcs: int = 2
    conv_out_channels: int = 256
    fc_out_channels: int = 1024

    @nn.compact
    def __call__(self, mask_feat: jnp.ndarray,    # (R, 14, 14, C)
                 mask_pred: jnp.ndarray           # (R, 28, 28) logits
                 ) -> jnp.ndarray:                # (R, num_classes)
        p = jax.nn.sigmoid(mask_pred.astype(jnp.float32))[..., None]
        pooled = nn.max_pool(p, (2, 2), strides=(2, 2))
        x = jnp.concatenate([mask_feat,
                             pooled.astype(mask_feat.dtype)], axis=-1)
        for i in range(self.num_convs):
            stride = 2 if i == self.num_convs - 1 else 1
            x = nn.relu(nn.Conv(
                self.conv_out_channels, (3, 3), strides=(stride, stride),
                padding=1,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_out", "normal"),
                name=f"conv{i}")(x))
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fcs):
            x = nn.relu(nn.Dense(
                self.fc_out_channels,
                kernel_init=nn.initializers.variance_scaling(
                    1.0, "fan_in", "uniform"),
                name=f"fc{i}")(x))
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        name="fc_mask_iou")(x)


def mask_area_ratio(
    pos_rois: jnp.ndarray,     # (R, 5) batch-indexed rois
    pos_gt_inds: jnp.ndarray,  # (R,)
    gt_masks: jnp.ndarray,     # (B, G, H/s, W/s)
    gt_stride: int = 1,
) -> jnp.ndarray:
    """Per-RoI ratio of the matched GT mask's area inside the (integer)
    box to its whole-instance area (``maskiou_head.py:147-171``
    ``_get_area_ratio`` with ``BitmapMasks.crop``'s int32-truncate +
    clamp box semantics). Returns (R,)."""
    b, g, h, w = gt_masks.shape
    sel = gt_masks.reshape(b * g, h, w)[
        pos_rois[:, 0].astype(jnp.int32) * g + pos_gt_inds]
    sel = sel.astype(jnp.bfloat16)
    scale = 1.0 / gt_stride
    box = (pos_rois[:, 1:] * scale).astype(jnp.int32)  # trunc, crop coords
    x1 = jnp.clip(box[:, 0], 0, w - 1)
    y1 = jnp.clip(box[:, 1], 0, h - 1)
    bw = jnp.clip(box[:, 2] - x1, 1, w - x1)
    bh = jnp.clip(box[:, 3] - y1, 1, h - y1)
    cols = jnp.arange(w)[None]
    rows = jnp.arange(h)[None]
    in_x = ((cols >= x1[:, None])
            & (cols < (x1 + bw)[:, None])).astype(jnp.bfloat16)
    in_y = ((rows >= y1[:, None])
            & (rows < (y1 + bh)[:, None])).astype(jnp.bfloat16)
    area_in = jnp.einsum("rhw,rh,rw->r", sel, in_y, in_x,
                         preferred_element_type=jnp.float32)
    area_full = jnp.einsum("rhw->r", sel.astype(jnp.float32))
    return area_in / (area_full + 1e-7)


def mask_iou_targets(
    mask_pred: jnp.ndarray,    # (R, S, S) gt-class logits
    mask_tgt: jnp.ndarray,     # (R, S, S) binary
    area_ratios: jnp.ndarray,  # (R,) gt-in-box / whole-gt area
    mask_thr_binary: float = 0.5,
) -> jnp.ndarray:
    """IoU between the binarized predicted mask and the whole GT instance
    (``maskiou_head.py:97-146`` ``get_targets``): the intersection is
    computed inside the box; the gt's full area extrapolates the in-box
    target area through ``area_ratios``."""
    pred = (jax.nn.sigmoid(mask_pred.astype(jnp.float32))
            > mask_thr_binary).astype(jnp.float32)
    pred_areas = pred.sum((-1, -2))
    overlap = (pred * mask_tgt).sum((-1, -2))
    gt_full = mask_tgt.sum((-1, -2)) / (area_ratios + 1e-7)
    iou = overlap / jnp.maximum(pred_areas + gt_full - overlap, 1e-7)
    return jnp.where(area_ratios > 0, iou, 0.0)


def mask_iou_head_loss(
    iou_pred: jnp.ndarray,     # (R,) predicted IoU for the gt class
    iou_tgt: jnp.ndarray,      # (R,)
    pos_weight: jnp.ndarray,   # (R,) 1 for real positives
    loss_weight: float = 0.5,
) -> jnp.ndarray:
    """MSE on positives whose IoU target > 0 (``maskiou_head.py:88-96``,
    loss_iou = MSELoss(loss_weight=0.5))."""
    use = pos_weight * (iou_tgt > 0)
    sq = (iou_pred.astype(jnp.float32) - iou_tgt) ** 2
    return loss_weight * (sq * use).sum() / jnp.maximum(use.sum(), 1.0)


def mask_targets(
    pos_rois: jnp.ndarray,     # (R, 5) batch-indexed rois (positives)
    pos_gt_inds: jnp.ndarray,  # (R,) matched gt index within image
    gt_masks: jnp.ndarray,     # (B, G, H/s, W/s) binary
    mask_size: int = 28,
    gt_stride: int = 1,
) -> jnp.ndarray:
    """Crop each positive RoI's matched GT mask to mask_size^2 with the
    same sampling grid as the RoIAlign kernel (``mask_target.py:7-127``:
    aligned, 2 samples/bin averaged). Returns (R, S, S).

    TPU formulation: bilinear cropping of a SINGLE-channel map is four
    scalar gathers per tap — pathological on TPU (measured 145 ms for 512
    LVIS rois). Because bilinear interpolation is separable, the crop is
    instead two einsums with per-roi sparse interpolation matrices,
    ``crop = Wy @ M @ Wx^T``, which ride the MXU: 6.7 ms for the same
    shapes, bit-identical up to fp accumulation order at exact-0.5 edges.

    ``gt_stride``: the masks may be stored at 1/s canvas resolution (the
    pipeline's ``mask_stride``) — sampling then uses spatial scale 1/s,
    cutting GT-mask HBM footprint by s^2 at a sub-cell accuracy cost.
    """
    b, g, h, w = gt_masks.shape
    r, s2 = pos_rois.shape[0], 2          # 2 samples per bin, averaged
    sel = gt_masks.reshape(b * g, h, w)[
        pos_rois[:, 0].astype(jnp.int32) * g + pos_gt_inds]
    sel = sel.astype(jnp.bfloat16)        # (R, H/s, W/s) 0/1 exact in bf16

    scale = 1.0 / gt_stride
    x1 = pos_rois[:, 1] * scale - 0.5
    y1 = pos_rois[:, 2] * scale - 0.5
    x2 = pos_rois[:, 3] * scale - 0.5
    y2 = pos_rois[:, 4] * scale - 0.5
    jj = (jnp.arange(mask_size * s2, dtype=jnp.float32) + 0.5) / s2
    ysamp = jnp.clip(y1[:, None] + (y2 - y1)[:, None] / mask_size * jj,
                     0.0, h - 1.0)        # (R, 2S)
    xsamp = jnp.clip(x1[:, None] + (x2 - x1)[:, None] / mask_size * jj,
                     0.0, w - 1.0)
    hgrid = jnp.arange(h, dtype=jnp.float32)
    wgrid = jnp.arange(w, dtype=jnp.float32)
    # tent(y, h) = max(0, 1-|y-h|): exactly the bilinear weights; bin's 2
    # sample rows averaged directly into the interpolation matrix
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(
        ysamp[:, :, None] - hgrid[None, None, :]))
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(
        xsamp[:, :, None] - wgrid[None, None, :]))
    wy = wy.reshape(r, mask_size, s2, h).mean(2).astype(jnp.bfloat16)
    wx = wx.reshape(r, mask_size, s2, w).mean(2).astype(jnp.bfloat16)
    a = jnp.einsum("rph,rhw->rpw", wy, sel,
                   preferred_element_type=jnp.float32)
    crops = jnp.einsum("rpw,rqw->rpq", a.astype(jnp.bfloat16), wx,
                       preferred_element_type=jnp.float32)
    return (crops >= 0.5).astype(jnp.float32)


def mask_head_loss(
    mask_pred: jnp.ndarray,    # (R, S, S) gt-class logits or (R, S, S, C)
    mask_tgt: jnp.ndarray,     # (R, S, S)
    labels: jnp.ndarray,       # (R,)
    pos_weight: jnp.ndarray,   # (R,) 1 for real positives
) -> jnp.ndarray:
    """Per-pixel BCE on the gt-class channel (``fcn_mask_head.py:148-178``),
    averaged over positive RoIs.

    Prefer passing the per-label logits from ``logits_for_labels`` — at
    LVIS scale the (R, S, S, 1203) full-logit variant's take_along_axis
    backward materializes a multi-GB scatter buffer."""
    if mask_pred.ndim == 4:
        c = mask_pred.shape[-1]
        cls = jnp.clip(labels, 0, c - 1)
        mask_pred = jnp.take_along_axis(
            mask_pred, cls[:, None, None, None], axis=-1)[..., 0]
    pred = mask_pred.astype(jnp.float32)
    bce = (jnp.maximum(pred, 0) - pred * mask_tgt
           + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    per_roi = bce.mean(axis=(1, 2))
    return (per_roi * pos_weight).sum() / jnp.maximum(pos_weight.sum(), 1.0)


def paste_masks(
    mask_pred: jnp.ndarray,    # (R, S, S) sigmoid probabilities (gt class)
    boxes: jnp.ndarray,        # (R, 4) detection boxes in image coords
    img_shape: Tuple[int, int],
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Paste each 28x28 mask into the full image (``_do_paste_mask``):
    one scale_and_translate per RoI, fully batched. Returns (R, H, W) bool."""
    h, w = img_shape
    s = mask_pred.shape[-1]
    # grid_sample zero-pads outside the mask while scale_and_translate
    # clamps to the border value; a 1-cell zero ring (with the box grown
    # by one bin to match) makes the clamped sample equal the reference's
    # zero-padded one at every canvas pixel (caught by
    # test_geometry_oracle: without it, border mask values leak over the
    # entire canvas outside the box).
    padded = jnp.pad(mask_pred, ((0, 0), (1, 1), (1, 1)))

    def _one(m, box):
        x1, y1, x2, y2 = box
        bw = jnp.maximum(x2 - x1, 1.0) / s
        bh = jnp.maximum(y2 - y1, 1.0) / s
        scale = jnp.stack([bh, bw])
        translation = jnp.stack([y1 - bh, x1 - bw])
        # antialias=False: the reference's grid_sample point-samples the
        # 28x28 mask bilinearly even when the box is smaller than 28px;
        # jax's antialiased downscale flips border pixels vs
        # _do_paste_mask.
        out = jax.image.scale_and_translate(
            m[..., None], (h, w, 1), (0, 1), scale, translation,
            method="bilinear", antialias=False)[..., 0]
        return out

    pasted = jax.vmap(_one)(padded, boxes)
    return pasted >= threshold
