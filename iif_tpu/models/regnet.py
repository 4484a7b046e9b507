"""RegNetX backbone, flax/NHWC, TPU-native.

Rebuild of the reference's RegNet
(``mmdet/models/backbones/regnet.py``: arch table :71-89, width
generation ``generate_regnet``/``adjust_width_group``/
``get_stages_from_blocks`` :252-342, 3x3/s2 32-channel stem with no
maxpool :238-250, bottleneck with bot_mul=1 group convs): the
quantized-linear width schedule is computed in numpy at construction —
the same integer widths/groups as the reference — and the trunk is plain
grouped-bottleneck stages, all MXU-friendly dense convs.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.models.resnet import BatchNorm, conv_init

REGNET_ARCH = {
    "regnetx_400mf": dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22),
    "regnetx_800mf": dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16),
    "regnetx_1.6gf": dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18),
    "regnetx_3.2gf": dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25),
    "regnetx_4.0gf": dict(w0=96, wa=38.65, wm=2.43, group_w=40, depth=23),
    "regnetx_6.4gf": dict(w0=184, wa=60.83, wm=2.07, group_w=56, depth=17),
    "regnetx_8.0gf": dict(w0=80, wa=49.56, wm=2.88, group_w=120, depth=23),
    "regnetx_12gf": dict(w0=168, wa=73.36, wm=2.37, group_w=112, depth=19),
}


def regnet_stage_params(arch: dict, bot_mul: float = 1.0,
                        divisor: int = 8
                        ) -> Tuple[List[int], List[int], List[int]]:
    """(stage_widths, stage_blocks, stage_groups) — ``regnet.py:252-342``
    reproduced exactly (verified against the docstring example:
    regnetx_3.2gf -> widths [96, 192, 432, 1008])."""
    w0, wa, wm, depth = (arch["w0"], arch["wa"], arch["wm"], arch["depth"])
    widths_cont = np.arange(depth) * wa + w0
    ks = np.round(np.log(widths_cont / w0) / np.log(wm))
    widths = w0 * np.power(wm, ks)
    widths = (np.round(widths / divisor) * divisor).astype(int).tolist()

    width_diff = [w != wp for w, wp in zip(widths + [0], [0] + widths)]
    stage_widths = [w for w, d in zip(widths, width_diff[:-1]) if d]
    stage_blocks = np.diff(
        [i for i, d in enumerate(width_diff) if d]).tolist()

    groups = [arch["group_w"]] * len(stage_widths)
    bw = [int(w * bot_mul) for w in stage_widths]
    groups = [min(g, w) for g, w in zip(groups, bw)]
    bw = [int(round(w / g) * g) for w, g in zip(bw, groups)]
    stage_widths = [int(w / bot_mul) for w in bw]
    return stage_widths, stage_blocks, groups


class RegBottleneck(nn.Module):
    """1x1 -> grouped 3x3 (stride) -> 1x1 with BN, bot_mul=1."""
    width: int
    groups: int
    stride: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        identity = x
        out = nn.Conv(self.width, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(BatchNorm(use_running_average=not train,
                                dtype=self.dtype, name="bn1")(out))
        out = nn.Conv(self.width, (3, 3), strides=self.stride, padding=1,
                      feature_group_count=self.groups, use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(BatchNorm(use_running_average=not train,
                                dtype=self.dtype, name="bn2")(out))
        out = nn.Conv(self.width, (1, 1), use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name="conv3")(out)
        out = BatchNorm(use_running_average=not train,
                        scale_init=nn.initializers.zeros,
                        dtype=self.dtype, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.width, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=conv_init,
                               dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = BatchNorm(use_running_average=not train,
                                 dtype=self.dtype,
                                 name="downsample_bn")(identity)
        return nn.relu(out + identity)


class RegNet(nn.Module):
    """RegNetX trunk (``regnet.py``; arch names in ``REGNET_ARCH``).
    3x3/s2 stem to 32 channels, four stride-2 stages; detection flags as
    in ResNet."""
    arch: str = "regnetx_3.2gf"
    num_classes: int = 1000
    frozen_stages: int = -1
    norm_eval: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = False
                 ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        widths, blocks, groups = regnet_stage_params(REGNET_ARCH[self.arch])
        if self.dtype is not None:
            x = x.astype(self.dtype)
        stem_train = train and self.frozen_stages < 0 and not self.norm_eval
        out = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False,
                      kernel_init=conv_init, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(BatchNorm(use_running_average=not stem_train,
                                dtype=self.dtype, name="bn1")(out))
        if self.frozen_stages >= 0:
            out = jax.lax.stop_gradient(out)

        feats = []
        for stage, (w, n, g) in enumerate(zip(widths, blocks, groups),
                                          start=1):
            stage_train = (train and stage > self.frozen_stages
                           and not self.norm_eval)
            for i in range(n):
                first = i == 0
                out = RegBottleneck(
                    w, g, 2 if first else 1,
                    downsample=first, dtype=self.dtype,
                    name=f"layer{stage}_{i}")(out, stage_train)
            if stage <= self.frozen_stages:
                out = jax.lax.stop_gradient(out)
            feats.append(out)

        if return_features:
            return tuple(feats)
        out = out.mean(axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(out)
