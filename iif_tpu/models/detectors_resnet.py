"""DetectoRS ResNet backbone (SAC + RFP inputs), NHWC flax.

Rebuild of ``mmdet/models/backbones/detectors_resnet.py`` + the mmcv
``SAConv2d`` op: a ResNet whose stage-2..4 bottleneck 3x3 convs are
SWITCHABLE ATROUS CONVOLUTIONS — the (weight-standardized) kernel runs
at dilation 1 and 3 (the d3 branch adds a zero-init weight delta) and a
5x5-average-pooled 1x1 switch blends the two; global-context 1x1 convs
bracket the op. Each stage's first block can additionally ingest an RFP
feedback feature through a zero-init 1x1 ``rfp_conv`` (the Recursive
Feature Pyramid loop of ``mmdet/models/necks/rfp.py``).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SAConv(nn.Module):
    """mmcv ``SAConv2d``: weight-standardized 3x3 conv, switchable
    between dilation 1 and 3 with shared weights (+ zero-init delta on
    the large branch), pre/post global context."""
    features: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        w = self.param("weight", conv_init, (3, 3, cin, self.features),
                       jnp.float32)
        w_diff = self.param("weight_diff", nn.initializers.zeros,
                            (3, 3, cin, self.features), jnp.float32)
        # AWS: standardize over (kh, kw, cin) per output channel
        mean = w.mean(axis=(0, 1, 2), keepdims=True)
        std = w.std(axis=(0, 1, 2), keepdims=True) + 1e-5
        w_s = (w - mean) / std

        # pre context: GAP -> 1x1, added to the input
        gap = x.mean(axis=(1, 2), keepdims=True)
        x = x + nn.Conv(cin, (1, 1), kernel_init=nn.initializers.zeros,
                        name="pre_context")(gap)
        # switch: 5x5 avg pool -> 1x1 conv (bias init 1 favors d=1)
        avg = nn.avg_pool(x, (5, 5), strides=(1, 1),
                          padding=((2, 2), (2, 2)))
        s = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones, name="switch")(avg))
        if self.stride > 1:
            s = s[:, ::self.stride, ::self.stride]

        def run(kernel, dilation):
            return jax.lax.conv_general_dilated(
                x.astype(jnp.float32), kernel,
                (self.stride, self.stride),
                ((dilation, dilation), (dilation, dilation)),
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        out = s * run(w_s, 1) + (1 - s) * run(w_s + w_diff, 3)
        gap2 = out.mean(axis=(1, 2), keepdims=True)
        out = out + nn.Conv(self.features, (1, 1),
                            kernel_init=nn.initializers.zeros,
                            name="post_context")(gap2)
        return out.astype(x.dtype)


class _SACBottleneck(nn.Module):
    planes: int
    stride: int = 1
    with_sac: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 rfp_feat: Optional[jnp.ndarray] = None):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        identity = x
        out = nn.relu(bn("bn1")(nn.Conv(
            self.planes, (1, 1), use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="conv1")(x)))
        if self.with_sac:
            out = SAConv(self.planes, self.stride, dtype=self.dtype,
                         name="conv2")(out)
        else:
            out = nn.Conv(self.planes, (3, 3),
                          strides=(self.stride, self.stride), padding=1,
                          use_bias=False, kernel_init=conv_init,
                          dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = bn("bn3")(nn.Conv(
            self.planes * 4, (1, 1), use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv3")(out))
        if identity.shape != out.shape:
            identity = bn("bn_down")(nn.Conv(
                self.planes * 4, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=conv_init, dtype=self.dtype,
                name="downsample")(identity))
        out = nn.relu(out + identity)
        if rfp_feat is not None:
            # zero-init rfp_conv: the recursion starts as identity
            out = out + nn.Conv(self.planes * 4, (1, 1),
                                kernel_init=nn.initializers.zeros,
                                name="rfp_conv")(rfp_feat)
        return out


class DetectoRSResNet(nn.Module):
    depth: int = 50
    sac_stages: Tuple[bool, ...] = (False, True, True, True)
    rfp_inplanes: int = 256
    frozen_stages: int = 1        # parity via optimizer masking
    norm_eval: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = True,
                 rfp_feats: Optional[Sequence[jnp.ndarray]] = None):
        train = train and not self.norm_eval

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        x = nn.relu(bn("bn1")(nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        outs = []
        for stage, n_blocks in enumerate(LAYERS[self.depth]):
            planes = 64 * 2 ** stage
            # rfp feedback enters the FIRST block of stages > 0
            # (detectors_resnet.py rfp_forward)
            rfp = None
            if rfp_feats is not None and stage > 0:
                rfp = rfp_feats[stage]
            for blk in range(n_blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = _SACBottleneck(
                    planes, stride, with_sac=self.sac_stages[stage],
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}")(
                    x, train=train, rfp_feat=rfp if blk == 0 else None)
            outs.append(x)
        return outs if return_features else x
