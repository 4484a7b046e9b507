"""CIFAR ResNet-s family (He et al. option-A shortcuts), flax/NHWC.

Functional rebuild of the reference ``classification/resnet_cifar.py``:
ResNet-20/32/44/56/110/1202 with zero-pad (option A) shortcuts
(`resnet_cifar.py:125-126`), SE variants (`:140-171`), and the
NormedLinear / CosNorm classifier head options (`:185-192`).

TPU notes: NHWC layout throughout (XLA:TPU's native conv layout). With
``norm="bn"`` BatchNorm runs over the *global* jit batch under
data-parallel sharding, i.e. SyncBN semantics; ``norm="bn@G"`` gives the
reference's per-GPU local-BN dynamics (stats per batch group — see
iif_tpu/models/norm.py).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from iif_tpu.models.layers import SEBlock, kaiming_normal, make_classifier_head

# torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 -> flax momentum 0.9.
BatchNorm = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5)
Conv3x3 = partial(nn.Conv, kernel_size=(3, 3), use_bias=False,
                  kernel_init=kaiming_normal, padding=1)


def _bn(norm: str, train: bool, name: str, dtype):
    if norm.startswith("bn@"):
        from iif_tpu.models.norm import LocalBatchNorm, parse_bn_spec

        return LocalBatchNorm(groups=parse_bn_spec(norm),
                              use_running_average=not train,
                              momentum=0.9, epsilon=1e-5, dtype=dtype,
                              name=name)
    return BatchNorm(use_running_average=not train, dtype=dtype, name=name)


def _option_a_shortcut(x: jnp.ndarray, planes: int) -> jnp.ndarray:
    """Identity shortcut for CIFAR ResNets: stride-2 spatial subsample +
    zero-pad channels by planes//4 on each side (`resnet_cifar.py:125-126`)."""
    x = x[:, ::2, ::2, :]
    pad = planes // 4
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (pad, pad)))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_se: bool = False
    norm: str = "bn"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        in_planes = x.shape[-1]
        out = Conv3x3(self.planes, strides=self.stride, dtype=self.dtype,
                      name="conv1")(x)
        out = _bn(self.norm, train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = Conv3x3(self.planes, strides=1, dtype=self.dtype,
                      name="conv2")(out)
        out = _bn(self.norm, train, "bn2", self.dtype)(out)
        if self.use_se:
            out = SEBlock(reduction=4, name="se")(out)
        if self.stride != 1 or in_planes != self.planes:
            shortcut = _option_a_shortcut(x, self.planes)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class ResNetS(nn.Module):
    """ResNet_s (`resnet_cifar.py:174-212`): 3x3 stem to 16ch, three stages
    of widths (16, 32, 64) with strides (1, 2, 2), GAP, classifier head."""

    num_blocks: Sequence[int] = (5, 5, 5)
    num_classes: int = 10
    use_norm: Optional[str] = None
    use_se: bool = False
    norm: str = "bn"        # 'bn' (global/sync) | 'bn@G' (local groups)
    dtype: object = None    # compute dtype (params/BN stats stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        out = Conv3x3(16, strides=1, dtype=self.dtype, name="conv1")(x)
        out = _bn(self.norm, train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        for stage, (planes, stride) in enumerate(
                zip((16, 32, 64), (1, 2, 2)), start=1):
            for i in range(self.num_blocks[stage - 1]):
                out = BasicBlock(
                    planes, stride if i == 0 else 1, use_se=self.use_se,
                    norm=self.norm, dtype=self.dtype,
                    name=f"layer{stage}_{i}")(out, train)
        out = out.mean(axis=(1, 2))  # global average pool
        head = make_classifier_head(self.num_classes, self.use_norm)
        return head(out)


def resnet20(num_classes=10, use_norm=None, **kw):
    return ResNetS((3, 3, 3), num_classes, use_norm, **kw)


def resnet32(num_classes=10, use_norm=None, **kw):
    return ResNetS((5, 5, 5), num_classes, use_norm, **kw)


def se_resnet32(num_classes=10, use_norm=None, **kw):
    return ResNetS((5, 5, 5), num_classes, use_norm, use_se=True, **kw)


def resnet44(num_classes=10, use_norm=None, **kw):
    return ResNetS((7, 7, 7), num_classes, use_norm, **kw)


def resnet56(num_classes=10, use_norm=None, **kw):
    return ResNetS((9, 9, 9), num_classes, use_norm, **kw)


def resnet110(num_classes=10, use_norm=None, **kw):
    return ResNetS((18, 18, 18), num_classes, use_norm, **kw)


def resnet1202(num_classes=10, use_norm=None, **kw):
    return ResNetS((200, 200, 200), num_classes, use_norm, **kw)
