"""HourglassNet backbone (CornerNet/CenterNet flavor), NHWC flax.

Rebuild of ``mmdet/models/backbones/hourglass.py``: a stride-4 stem
(7x7 s2 conv + stride-2 residual), then ``num_stacks`` recursive
hourglass modules (downsample ``downsample_times`` levels with
per-level channels, symmetric upsampling with skip residuals), each
followed by a 3x3 conv feature head; stacks are bridged by 1x1
conv+BN remaps with intermediate supervision taps (CornerNet trains
both stack outputs).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _Res(nn.Module):
    channels: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        identity = x
        out = nn.relu(bn("bn1")(nn.Conv(
            self.channels, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="conv1")(x)))
        out = bn("bn2")(nn.Conv(
            self.channels, (3, 3), padding=1, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv2")(out))
        if identity.shape != out.shape:
            identity = bn("bn_down")(nn.Conv(
                self.channels, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=conv_init, dtype=self.dtype,
                name="downsample")(identity))
        return nn.relu(out + identity)


class _HourglassModule(nn.Module):
    """Recursive encoder-decoder (``hourglass.py`` HourglassModule)."""
    stage_channels: Tuple[int, ...]
    stage_blocks: Tuple[int, ...]
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cur = self.stage_channels[0]
        nxt = self.stage_channels[1]
        b1, b2 = self.stage_blocks[0], self.stage_blocks[1]

        up1 = x
        for i in range(b1):
            up1 = _Res(cur, dtype=self.dtype,
                       name=f"up1_{i}")(up1, train=train)
        low1 = x
        for i in range(b1):
            low1 = _Res(nxt, stride=2 if i == 0 else 1,
                        dtype=self.dtype,
                        name=f"low1_{i}")(low1, train=train)
        if len(self.stage_channels) > 2:
            low2 = _HourglassModule(
                tuple(self.stage_channels[1:]),
                tuple(self.stage_blocks[1:]), dtype=self.dtype,
                name="low2")(low1, train=train)
        else:
            low2 = low1
            for i in range(b2):
                low2 = _Res(nxt, dtype=self.dtype,
                            name=f"low2_{i}")(low2, train=train)
        low3 = low2
        for i in range(b1):
            ch = cur if i == b1 - 1 else nxt
            low3 = _Res(ch, dtype=self.dtype,
                        name=f"low3_{i}")(low3, train=train)
        th, tw = up1.shape[1:3]
        up2 = jax.image.resize(
            low3, (low3.shape[0], th, tw, low3.shape[-1]), "nearest")
        return up1 + up2


class HourglassNet(nn.Module):
    """2-stack CornerNet HourglassNet (``hourglass.py`` defaults:
    downsample 5, channels (256, 256, 384, 384, 384, 512), blocks
    (2, 2, 2, 2, 2, 4)). Returns both stacks' 256-ch stride-4 maps."""
    num_stacks: int = 2
    stage_channels: Tuple[int, ...] = (256, 256, 384, 384, 384, 512)
    stage_blocks: Tuple[int, ...] = (2, 2, 2, 2, 2, 4)
    feat_channel: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = True):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        c0 = self.stage_channels[0]
        # stem: 7x7 s2 (c0 // 2) + stride-2 residual (c0)
        x = nn.relu(bn("stem_bn")(nn.Conv(
            c0 // 2, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="stem_conv")(x)))
        x = _Res(c0, stride=2, dtype=self.dtype,
                 name="stem_res")(x, train=train)

        outs = []
        inter = x
        for s in range(self.num_stacks):
            hg = _HourglassModule(self.stage_channels, self.stage_blocks,
                                  dtype=self.dtype,
                                  name=f"hg{s}")(inter, train=train)
            feat = nn.relu(bn(f"out_bn{s}")(nn.Conv(
                self.feat_channel, (3, 3), padding=1, use_bias=False,
                kernel_init=conv_init, dtype=self.dtype,
                name=f"out_conv{s}")(hg)))
            outs.append(feat)
            if s < self.num_stacks - 1:
                inter = nn.relu(
                    bn(f"remap_bn{s}")(nn.Conv(
                        c0, (1, 1), use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name=f"remap_conv{s}")(inter))
                    + bn(f"remap_feat_bn{s}")(nn.Conv(
                        c0, (1, 1), use_bias=False,
                        kernel_init=conv_init, dtype=self.dtype,
                        name=f"remap_feat_conv{s}")(feat)))
        return outs if return_features else outs[-1]
