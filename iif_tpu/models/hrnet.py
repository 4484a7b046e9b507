"""HRNet backbone (HRNetV2p), NHWC flax.

Rebuild of ``mmdet/models/backbones/hrnet.py`` (detection configs
``configs/hrnet/*``): stem of two stride-2 3x3 convs; stage 1 = 4
bottlenecks at 1/4; then three multi-resolution stages where parallel
branches at strides (4, 8, 16, 32) exchange information after every
module — downsampling via stride-2 3x3 convs, upsampling via 1x1 conv +
nearest resize, summed and relu'd. Outputs the four branch maps
(HRNetV2p feeds them to HRFPN).

Standard widths: W18 (18, 36, 72, 144), W32 (32, 64, 128, 256),
W40 (40, 80, 160, 320).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# (num_modules, num_blocks) per stage 2..4; blocks are BASIC
STAGE_CFG = ((1, 4), (4, 4), (3, 4))
WIDTHS = {18: (18, 36, 72, 144), 32: (32, 64, 128, 256),
          40: (40, 80, 160, 320)}

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _Basic(nn.Module):
    planes: int
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
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="conv1")(x)))
        out = bn("bn2")(nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv2")(out))
        if identity.shape != out.shape:
            identity = bn("bn_down")(nn.Conv(
                self.planes, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=conv_init, dtype=self.dtype,
                name="downsample")(identity))
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    planes: int
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
        out = nn.relu(bn("bn2")(nn.Conv(
            self.planes, (3, 3), padding=1, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv2")(out)))
        out = bn("bn3")(nn.Conv(
            self.planes * 4, (1, 1), use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv3")(out))
        if identity.shape != out.shape:
            identity = bn("bn_down")(nn.Conv(
                self.planes * 4, (1, 1), use_bias=False,
                kernel_init=conv_init, dtype=self.dtype,
                name="downsample")(identity))
        return nn.relu(out + identity)


class HRNet(nn.Module):
    width: int = 32
    frozen_stages: int = -1       # parity via optimizer masking
    norm_eval: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = True):
        train = train and not self.norm_eval
        widths = WIDTHS[self.width]

        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        # stem: two stride-2 convs -> 1/4
        x = nn.relu(bn("bn1")(nn.Conv(
            64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(
            64, (3, 3), strides=(2, 2), padding=1, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv2")(x)))

        # stage 1: 4 bottlenecks (64 -> 256)
        for i in range(4):
            x = _Bottleneck(64, dtype=self.dtype,
                            name=f"layer1_{i}")(x, train=train)

        # transition to 2 branches
        branches = [
            nn.relu(bn("t1_bn0")(nn.Conv(
                widths[0], (3, 3), padding=1, use_bias=False,
                kernel_init=conv_init, dtype=self.dtype,
                name="t1_conv0")(x))),
            nn.relu(bn("t1_bn1")(nn.Conv(
                widths[1], (3, 3), strides=(2, 2), padding=1,
                use_bias=False, kernel_init=conv_init, dtype=self.dtype,
                name="t1_conv1")(x))),
        ]

        for stage, (num_modules, num_blocks) in enumerate(STAGE_CFG):
            n_br = stage + 2
            # new branch from the last existing one (transition)
            if len(branches) < n_br:
                prev = branches[-1]
                branches.append(nn.relu(bn(f"t{stage + 1}_bn_new")(
                    nn.Conv(widths[n_br - 1], (3, 3), strides=(2, 2),
                            padding=1, use_bias=False,
                            kernel_init=conv_init, dtype=self.dtype,
                            name=f"t{stage + 1}_conv_new")(prev))))
            for m in range(num_modules):
                # per-branch blocks
                branches = [
                    _brancher(self, branches[i], widths[i], num_blocks,
                              f"s{stage + 2}_m{m}_b{i}", train)
                    for i in range(n_br)]
                # full fusion
                fused = []
                for i in range(n_br):
                    acc = 0.0
                    for j in range(n_br):
                        y = branches[j]
                        name = f"s{stage + 2}_m{m}_f{i}_{j}"
                        if j > i:      # upsample: 1x1 conv + nearest
                            y = bn(name + "_bn")(nn.Conv(
                                widths[i], (1, 1), use_bias=False,
                                kernel_init=conv_init, dtype=self.dtype,
                                name=name + "_conv")(y))
                            th, tw = branches[i].shape[1:3]
                            y = jax.image.resize(
                                y, (y.shape[0], th, tw, y.shape[-1]),
                                "nearest")
                        elif j < i:    # downsample: stride-2 3x3 chain
                            for k in range(i - j):
                                last = k == i - j - 1
                                ch = widths[i] if last else widths[j]
                                y = bn(f"{name}_d{k}_bn")(nn.Conv(
                                    ch, (3, 3), strides=(2, 2),
                                    padding=1, use_bias=False,
                                    kernel_init=conv_init,
                                    dtype=self.dtype,
                                    name=f"{name}_d{k}_conv")(y))
                                if not last:
                                    y = nn.relu(y)
                        acc = acc + y
                    fused.append(nn.relu(acc))
                branches = fused
        return branches if return_features else branches[-1]


def _brancher(parent, x, width, num_blocks, prefix, train):
    for bi in range(num_blocks):
        x = _Basic(width, dtype=parent.dtype,
                   name=f"{prefix}_blk{bi}")(x, train=train)
    return x
