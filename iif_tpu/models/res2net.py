"""Res2Net backbone, flax/NHWC, TPU-native.

Rebuild of the reference's Res2Net
(``mmdet/models/backbones/res2net.py``: Bottle2neck :15-160, Res2Layer
:163-240): the bottleneck's single 3x3 conv becomes ``scales`` (4)
hierarchical width-26 3x3 convs with cumulative residual adds; stage
first blocks ('stage' type) skip the cumulative add and average-pool the
last split; downsampling shortcuts are avg-pool + 1x1 conv (avg_down).

All splits are static channel slices — the hierarchy is ``scales - 1``
small convs XLA schedules back-to-back; everything else matches the
ResNet trunk (frozen_stages / norm_eval semantics shared with
``iif_tpu/models/resnet.py``).
"""
from __future__ import annotations

import math
from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from iif_tpu.models.resnet import BatchNorm, conv_init


class Bottle2neck(nn.Module):
    """``res2net.py:15-160`` (stage_type='stage' on each stage's first
    block, 'normal' otherwise)."""
    planes: int
    stride: int = 1
    downsample: bool = False
    scales: int = 4
    base_width: int = 26
    stage_type: str = "normal"
    dtype: object = None

    expansion = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        width = int(math.floor(self.planes * (self.base_width / 64.0)))
        identity = x
        out = nn.Conv(width * self.scales, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name="conv1")(x)
        out = BatchNorm(use_running_average=not train, dtype=self.dtype,
                        name="bn1")(out)
        out = nn.relu(out)

        spx = [out[..., i * width:(i + 1) * width]
               for i in range(self.scales)]
        sp = None
        outs = []
        for i in range(self.scales - 1):
            if i == 0 or self.stage_type == "stage":
                sp = spx[i]
            else:
                sp = sp + spx[i]
            sp = nn.Conv(width, (3, 3), strides=self.stride, padding=1,
                         use_bias=False, kernel_init=conv_init,
                         dtype=self.dtype, name=f"conv2_{i}")(sp)
            sp = nn.relu(BatchNorm(use_running_average=not train,
                                   dtype=self.dtype,
                                   name=f"bn2_{i}")(sp))
            outs.append(sp)
        if self.stage_type == "normal" or self.stride == 1:
            outs.append(spx[-1])
        else:
            # stage first block with stride: avg-pool the last split
            outs.append(nn.avg_pool(spx[-1], (3, 3),
                                    strides=(self.stride, self.stride),
                                    padding=((1, 1), (1, 1))))
        out = jnp.concatenate(outs, axis=-1)

        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name="conv3")(out)
        out = BatchNorm(use_running_average=not train,
                        scale_init=nn.initializers.zeros,
                        dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            # avg_down shortcut (`res2net.py:198-212`): ceil-mode
            # stride-k avgpool + 1x1/s1 conv
            if self.stride != 1:
                identity = nn.avg_pool(
                    identity, (self.stride, self.stride),
                    strides=(self.stride, self.stride))
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               use_bias=False, kernel_init=conv_init,
                               dtype=self.dtype,
                               name="downsample_conv")(identity)
            identity = BatchNorm(use_running_average=not train,
                                 dtype=self.dtype,
                                 name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Res2Net(nn.Module):
    """Res2Net-50/101 trunk (res2net50_26w_4s layout; detection flags
    shared with ResNet). ``return_features`` yields C2..C5 for FPN."""
    layers: Sequence[int] = (3, 4, 6, 3)
    scales: int = 4
    base_width: int = 26
    num_classes: int = 1000
    frozen_stages: int = -1
    norm_eval: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False
                 ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        stem_train = train and self.frozen_stages < 0 and not self.norm_eval
        out = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name="conv1")(x)
        out = BatchNorm(use_running_average=not stem_train,
                        dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2),
                          padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            out = jax.lax.stop_gradient(out)

        feats = []
        for stage, (planes, n_blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers), start=1):
            stage_train = (train and stage > self.frozen_stages
                           and not self.norm_eval)
            stride = 1 if stage == 1 else 2
            for i in range(n_blocks):
                first = i == 0
                downsample = first and (
                    stride != 1 or out.shape[-1] != planes * 4)
                out = Bottle2neck(
                    planes, stride if first else 1, downsample,
                    scales=self.scales, base_width=self.base_width,
                    stage_type="stage" if first else "normal",
                    dtype=self.dtype,
                    name=f"layer{stage}_{i}")(out, stage_train)
            if stage <= self.frozen_stages:
                out = jax.lax.stop_gradient(out)
            feats.append(out)

        if return_features:
            return tuple(feats)
        out = out.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(out)


def res2net50_26w_4s(**kw) -> Res2Net:
    return Res2Net((3, 4, 6, 3), scales=4, base_width=26, **kw)


def res2net101_26w_4s(**kw) -> Res2Net:
    return Res2Net((3, 4, 23, 3), scales=4, base_width=26, **kw)
