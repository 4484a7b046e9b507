"""TridentResNet backbone, NHWC flax.

Rebuild of ``mmdet/models/backbones/trident_resnet.py``: a C4-style
ResNet (stages 1-3 shared; stride-16 output with a dilated final stage)
whose LAST stage runs ``num_branch`` WEIGHT-SHARED branches at
dilations (1, 2, 3). During training all branches run (outputs stack
along the batch axis, the TridentNet multi-branch training scheme); at
test only ``test_branch_idx`` runs.

Weight sharing is structural here: the same flax submodules are applied
once per branch with different ``kernel_dilation`` — no parameter
duplication, exactly the reference's shared-weight semantics.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

LAYERS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class _SharedDilatedBottleneck(nn.Module):
    """One bottleneck whose 3x3 conv kernel is shared across branch
    dilations: the params are created once; ``__call__`` takes the
    branch dilation."""
    planes: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, dilation: int = 1, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        identity = x
        out = nn.relu(bn("bn1")(nn.Conv(
            self.planes, (1, 1), use_bias=False, kernel_init=conv_init,
            dtype=self.dtype, name="conv1")(x)))
        out = nn.relu(bn("bn2")(nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=dilation, kernel_dilation=(dilation, dilation),
            use_bias=False, kernel_init=conv_init, dtype=self.dtype,
            name="conv2")(out)))
        out = bn("bn3")(nn.Conv(
            self.planes * 4, (1, 1), use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv3")(out))
        if identity.shape != out.shape:
            identity = bn("bn_down")(nn.Conv(
                self.planes * 4, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                kernel_init=conv_init, dtype=self.dtype,
                name="downsample")(identity))
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _SharedDilatedBottleneck(
            self.planes, self.stride, dtype=self.dtype,
            name="blk")(x, 1, train)


class TridentResNet(nn.Module):
    depth: int = 50
    num_branch: int = 3
    trident_dilations: Tuple[int, ...] = (1, 2, 3)
    test_branch_idx: int = 1
    frozen_stages: int = 1        # parity via optimizer masking
    norm_eval: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_features: bool = True):
        train_bn = train and not self.norm_eval

        def bn(name):
            return nn.BatchNorm(use_running_average=not train_bn,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        x = nn.relu(bn("bn1")(nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        layers = LAYERS[self.depth]
        # stages 1-3 (C2-C4), standard
        for stage in range(3):
            planes = 64 * 2 ** stage
            for blk in range(layers[stage]):
                stride = 2 if (stage > 0 and blk == 0) else 1
                x = _Bottleneck(planes, stride, dtype=self.dtype,
                                name=f"layer{stage + 1}_{blk}")(
                    x, train=train_bn)

        # trident stage (C5 at stride 16: first block stride 1,
        # dilations per branch, weights shared across branches)
        blocks = [
            _SharedDilatedBottleneck(512, 1, dtype=self.dtype,
                                     name=f"layer4_{i}")
            for i in range(layers[3])]

        def run_branch(inp, dilation):
            h = inp
            for blkm in blocks:
                h = blkm(h, dilation, train_bn)
            return h

        if train or self.test_branch_idx == -1:
            outs = [run_branch(x, d) for d in self.trident_dilations]
            # branches stack along batch (trident multi-branch training)
            c5 = jnp.concatenate(outs, axis=0)
        else:
            c5 = run_branch(
                x, self.trident_dilations[self.test_branch_idx])
        return [c5] if return_features else c5
