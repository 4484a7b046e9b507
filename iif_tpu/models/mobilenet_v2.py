"""MobileNetV2 backbone, NHWC flax.

Rebuild of ``mmdet/models/backbones/mobilenet_v2.py``: the standard
inverted-residual stack (arch_settings ``[t, c, n, s]`` rows), stem
conv 3x3 s2 -> 32, detection out_indices (1, 2, 4, 7) giving strides
(4, 8, 16, 32) with channels (24, 32, 96, 1280). ReLU6 activations,
BN everywhere.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

ARCH = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        identity = x

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        h = x
        if self.expand_ratio != 1:
            h = relu6(bn("bn_expand")(nn.Conv(
                hidden, (1, 1), use_bias=False, dtype=self.dtype,
                name="conv_expand")(h)))
        h = relu6(bn("bn_dw")(nn.Conv(
            hidden, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=hidden, use_bias=False, dtype=self.dtype,
            name="conv_dw")(h)))
        h = bn("bn_project")(nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv_project")(h))
        if self.stride == 1 and cin == self.out_channels:
            h = h + identity
        return h


class MobileNetV2(nn.Module):
    widen_factor: float = 1.0
    out_indices: Tuple[int, ...] = (1, 2, 4, 7)
    frozen_stages: int = -1      # parity via optimizer masking
    norm_eval: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = True):
        train = train and not self.norm_eval
        c = _make_divisible(32 * self.widen_factor)
        x = relu6(nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1")(nn.Conv(
                c, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                dtype=self.dtype, name="conv1")(x)))
        outs = []
        # mmdet's 0-based layer indices: 0..6 = the 7 inverted-residual
        # stages, 7 = the final 1x1 conv2 (1280 ch); out_indices
        # (1, 2, 4, 7) -> channels (24, 32, 96, 1280), strides
        # (4, 8, 16, 32)
        for i, (t, ch, n, s) in enumerate(ARCH):
            oc = _make_divisible(ch * self.widen_factor)
            for j in range(n):
                x = InvertedResidual(
                    oc, s if j == 0 else 1, t, dtype=self.dtype,
                    name=f"layer{i + 1}_{j}")(x, train=train)
            if i in self.out_indices:
                outs.append(x)
        x = relu6(nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2")(nn.Conv(
                _make_divisible(1280 * max(self.widen_factor, 1.0)),
                (1, 1), use_bias=False, dtype=self.dtype,
                name="conv2")(x)))
        if 7 in self.out_indices:
            outs.append(x)
        return outs if return_features else x
