"""DetectoRS (Cascade R-CNN + RFP + SAC), static-shape.

Rebuild of the reference DetectoRS family (backbone
``mmdet/models/backbones/detectors_resnet.py``, neck
``mmdet/models/necks/rfp.py``, config
``configs/detectors/detectors_cascade_rcnn_r50_1x_coco.py``): a cascade
whose backbone uses SWITCHABLE ATROUS CONVOLUTIONS (models/
detectors_resnet.py) and whose feature extraction unrolls the RECURSIVE
FEATURE PYRAMID: FPN outputs pass through an ASPP, feed back into a
SECOND (unshared, the reference's ``rfp_modules``) SAC backbone via
zero-init rfp_convs, and the two FPN passes blend with a learned
per-pixel sigmoid weight.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iif_tpu.detection.cascade import CascadeMaskRCNN
from iif_tpu.detection.detector import normalize_if_uint8
from iif_tpu.models.detectors_resnet import DetectoRSResNet


class ASPP(nn.Module):
    """``rfp.py`` ASPP: three dilated 3x3 branches + a GAP branch, each
    out_channels//4, relu'd and concatenated."""
    out_channels: int = 64        # per-branch (rfp aspp_out_channels=64)
    dilations: Tuple[int, ...] = (1, 3, 6, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gap = x.mean(axis=(1, 2), keepdims=True)
        outs = []
        for i, d in enumerate(self.dilations):
            inp = gap if i == len(self.dilations) - 1 else x
            k = 1 if d == 1 else 3
            o = nn.relu(nn.Conv(
                self.out_channels, (k, k), padding=(k // 2) * d,
                kernel_dilation=(d, d), name=f"aspp_{i}")(inp))
            outs.append(o)
        outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
        return jnp.concatenate(outs, axis=-1)


class DetectoRS(CascadeMaskRCNN):
    """``type='DetectoRS'`` (cascade variant). ``rfp_steps=2``."""
    rfp_steps: int = 2
    backbone_type: str = "detectors"

    def setup(self):
        super().setup()
        # unshared second-step backbone (rfp_modules in the reference)
        self.rfp_backbone = DetectoRSResNet(
            depth=self.depth, frozen_stages=self.frozen_stages,
            norm_eval=self.norm_eval, dtype=self.compute_dtype,
            name="rfp_backbone")
        self.rfp_aspp = ASPP(name="rfp_aspp")
        self.rfp_weight = nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="rfp_weight")

    def extract_feat(self, images, train: bool = False):
        """``rfp.py:117-135`` forward, unrolled for rfp_steps=2."""
        img = normalize_if_uint8(images)
        feats = self.backbone(img, train=train, return_features=True)
        x = self.neck(feats)
        for _ in range(self.rfp_steps - 1):
            rfp_feats = [x[0]] + [self.rfp_aspp(x[i])
                                  for i in range(1, len(x))]
            feats2 = self.rfp_backbone(img, train=train,
                                       return_features=True,
                                       rfp_feats=rfp_feats)
            x2 = self.neck(feats2)
            x_new = []
            for a, b_ in zip(x2, x):
                w = jax.nn.sigmoid(self.rfp_weight(a))
                x_new.append(w * a + (1 - w) * b_)
            x = tuple(x_new)
        return x
