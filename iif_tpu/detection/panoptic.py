"""Panoptic FPN, static-shape.

Rebuild of the reference panoptic family
(``mmdet/models/detectors/panoptic_fpn.py`` +
``panoptic_two_stage_segmentor.py``, semantic head
``mmdet/models/seg_heads/panoptic_fpn_head.py`` (+ ``ConvUpsample``),
fusion ``seg_heads/panoptic_fusion_heads/heuristic_fusion_head.py``):
MaskRCNN plus a semantic branch that conv-upsamples P2-P5 to stride 4,
sums them and predicts (stuff + 1) classes — thing pixels collapse to a
single foreground class (``_set_things_to_void``) — trained with CE;
panoptic results fuse instance masks (score-ordered, overlap-pruned)
with the stuff argmax on the host (``heuristic_fuse``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.detector import MaskRCNN

xavier_uniform = nn.initializers.xavier_uniform()


class ConvUpsample(nn.Module):
    """``mmdet/models/utils/conv_upsample.py``: num_layers convs (GN32 +
    relu), 2x bilinear upsample after the first num_upsample of them."""
    inner_channels: int = 128
    num_layers: int = 1
    num_upsample: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = nn.relu(nn.GroupNorm(num_groups=32, name=f"gn{i}")(
                nn.Conv(self.inner_channels, (3, 3), padding=1,
                        use_bias=False, kernel_init=xavier_uniform,
                        name=f"conv{i}")(x)))
            if i < self.num_upsample:
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, h * 2, w * 2, c), "bilinear")
        return x


class PanopticFPNHead(nn.Module):
    """``panoptic_fpn_head.py:12-116``: per-level ConvUpsample to
    stride 4, summed, 1x1 logits over (num_stuff + 1) classes."""
    num_classes: int               # = num_stuff + 1 (merged things)
    inner_channels: int = 128

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        acc = 0.0
        for i in range(4):
            acc = acc + ConvUpsample(
                self.inner_channels,
                num_layers=max(i, 1), num_upsample=i,
                name=f"conv_upsample_{i}")(feats[i])
        return nn.Conv(self.num_classes, (1, 1),
                       kernel_init=nn.initializers.normal(0.01),
                       name="conv_logits")(acc)


class PanopticFPN(MaskRCNN):
    """``type='PanopticFPN'``: MaskRCNN + stuff branch."""
    num_stuff_classes: int = 53

    def setup(self):
        super().setup()
        self.semantic_head = PanopticFPNHead(
            self.num_stuff_classes + 1, name="semantic_head")

    def forward_semantic(self, feats):
        return self.semantic_head(feats)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        out = super().__call__(images, train)
        feats = self.extract_feat(images, train=train)
        self.semantic_head(feats)
        return out


def set_things_to_void(gt_seg: jnp.ndarray, num_things: int,
                       num_stuff: int) -> jnp.ndarray:
    """``panoptic_fpn_head.py:73-91``: stuff ids [things, things+stuff)
    shift to [0, stuff); every thing pixel becomes class ``stuff``;
    anything else (255 / void) -> ignore (-1)."""
    fg = (gt_seg >= 0) & (gt_seg < num_things)
    bg = (gt_seg >= num_things) & (gt_seg < num_things + num_stuff)
    out = jnp.full_like(gt_seg, -1)
    out = jnp.where(bg, gt_seg - num_things, out)
    out = jnp.where(fg, num_stuff, out)
    return out


def panoptic_semantic_loss(model: "PanopticFPN", variables, feats,
                           gt_semantic_seg: jnp.ndarray) -> jnp.ndarray:
    """CE over the merged label space, ignore -1, at the gt's
    resolution (the reference interpolates preds to the gt)."""
    seg = model.apply(variables, feats,
                      method=PanopticFPN.forward_semantic)
    gt = set_things_to_void(gt_semantic_seg, model.num_classes,
                            model.num_stuff_classes)
    b, gh, gw = gt.shape
    if seg.shape[1:3] != (gh, gw):
        seg = jax.image.resize(
            seg, (b, gh, gw, seg.shape[-1]), "bilinear")
    logp = jax.nn.log_softmax(seg.astype(jnp.float32), -1)
    valid = gt >= 0
    cls = jnp.clip(gt, 0, model.num_stuff_classes)
    ce = -jnp.take_along_axis(logp, cls[..., None], axis=-1)[..., 0]
    return (ce * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def heuristic_fuse(
    boxes: np.ndarray,        # (K, 4)
    scores: np.ndarray,       # (K,)
    labels: np.ndarray,       # (K,) thing class ids
    valid: np.ndarray,        # (K,)
    inst_masks: np.ndarray,   # (K, H, W) bool, image-sized
    seg_logits: np.ndarray,   # (h, w, stuff+1)
    num_things: int,
    overlap_thr: float = 0.5,
    stuff_area_limit: int = 4096,
) -> np.ndarray:
    """``heuristic_fusion_head.py`` simple_test on the host: lay
    instance masks by descending score (skip if >50% covered), then fill
    uncovered pixels with the stuff argmax (small stuff -> void).
    Returns the panoptic map (H, W) int32 with
    ``label + inst_id * INSTANCE_OFFSET`` encoding (thing) or
    ``num_things + stuff_id`` (stuff), -1 = void."""
    INSTANCE_OFFSET = 1000
    h, w = inst_masks.shape[-2:]
    pan = np.full((h, w), -1, np.int64)
    order = np.argsort(-scores)
    inst_id = 1
    taken = np.zeros((h, w), bool)
    for i in order:
        if not valid[i]:
            continue
        m = inst_masks[i].astype(bool)
        area = m.sum()
        if area == 0:
            continue
        inter = (m & taken).sum()
        if inter / (area + 1e-5) > overlap_thr:
            continue
        part = m & ~taken
        pan[part] = int(labels[i]) + inst_id * INSTANCE_OFFSET
        taken |= part
        inst_id += 1

    seg = seg_logits
    if seg.shape[:2] != (h, w):
        import cv2

        seg = cv2.resize(seg, (w, h), interpolation=cv2.INTER_LINEAR)
    stuff = seg.argmax(-1)
    # the last channel is the merged-things foreground: not stuff
    for sid in range(seg.shape[-1] - 1):
        mask = (stuff == sid) & ~taken
        if mask.sum() < stuff_area_limit:
            continue
        pan[mask] = num_things + sid
    return pan
