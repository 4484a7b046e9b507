"""ResNeSt backbone (Split-Attention ResNet), NHWC flax.

Rebuild of ``mmdet/models/backbones/resnest.py`` (+ configs
``configs/resnest/*``): ResNetV1d trunk (deep 3-conv stem, avg-pool
downsampling in the shortcut) whose bottleneck 3x3 is a SplAtConv2d —
the conv emits ``radix`` feature groups whose sum is squeezed (GAP ->
fc -> BN -> relu -> fc) into per-radix logits, softmaxed over radix
(rSoftMax) and used to re-weight the groups. radix=2, groups=1,
width 64 per the released resnest50 config.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class SplAtConv(nn.Module):
    """``resnest.py`` SplAtConv2d, radix=2 groups=1."""
    channels: int
    stride: int = 1
    radix: int = 2
    reduction_factor: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        r, c = self.radix, self.channels
        h = nn.Conv(c * r, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=r, use_bias=False,
                    kernel_init=conv_init, dtype=self.dtype,
                    name="conv")(x)
        h = nn.relu(bn("bn0")(h))
        b, hh, ww, _ = h.shape
        splits = h.reshape(b, hh, ww, r, c)
        gap = splits.sum(3).mean(axis=(1, 2))              # (B, C)
        inter = max(c * r // self.reduction_factor, 32)
        g = nn.relu(bn("bn1")(nn.Dense(inter, name="fc1")(gap)))
        att = nn.Dense(c * r, name="fc2")(g).reshape(b, r, c)
        att = jax.nn.softmax(att, axis=1)                  # rSoftMax
        out = (splits * att[:, None, None, :, :]).sum(3)
        return out


class _NeStBottleneck(nn.Module):
    planes: int
    stride: int = 1
    avg_down_stride: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        identity = x
        out = nn.relu(bn("bn1")(nn.Conv(
            self.planes, (1, 1), use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="conv1")(x)))
        # stride moves into an avg-pool before the SplAt conv
        if self.stride > 1 and self.avg_down_stride:
            out = nn.avg_pool(out, (3, 3), strides=(self.stride,) * 2,
                              padding=((1, 1), (1, 1)))
            out = SplAtConv(self.planes, 1, dtype=self.dtype,
                            name="conv2")(out, train=train)
        else:
            out = SplAtConv(self.planes, self.stride, dtype=self.dtype,
                            name="conv2")(out, train=train)
        out = bn("bn3")(nn.Conv(
            self.planes * 4, (1, 1), use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv3")(out))
        if identity.shape != out.shape:
            # ResNetV1d avg_down shortcut
            if self.stride > 1:
                identity = nn.avg_pool(identity, (self.stride,) * 2,
                                       strides=(self.stride,) * 2)
            identity = bn("bn_down")(nn.Conv(
                self.planes * 4, (1, 1), use_bias=False,
                kernel_init=conv_init, dtype=self.dtype,
                name="downsample")(identity))
        return nn.relu(out + identity)


class ResNeSt(nn.Module):
    depth: int = 50
    frozen_stages: int = 1        # parity via optimizer masking
    norm_eval: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = True):
        train = train and not self.norm_eval

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        # deep stem (ResNetV1d): 3x conv3x3 (32, 32, 64)
        x = nn.relu(bn("bn_s1")(nn.Conv(
            32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="stem1")(x)))
        x = nn.relu(bn("bn_s2")(nn.Conv(
            32, (3, 3), padding=1, use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="stem2")(x)))
        x = nn.relu(bn("bn_s3")(nn.Conv(
            64, (3, 3), padding=1, use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="stem3")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        outs = []
        for stage, n_blocks in enumerate(LAYERS[self.depth]):
            planes = 64 * 2 ** stage
            for blk in range(n_blocks):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = _NeStBottleneck(
                    planes, stride, dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}")(x, train=train)
            outs.append(x)
        return outs if return_features else x
