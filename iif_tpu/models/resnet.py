"""ImageNet ResNet family (v1.5), flax/NHWC, TPU-native.

Rebuild of the reference's forked torchvision ResNet
(``classification/resnet_pytorch.py``): resnet18/34/50/101/152,
resnext50_32x4d / resnext101_32x8d, wide variants, SE-bottleneck variants
(`resnet_pytorch.py:320-381,472-551`), with the same classifier-head options
(`:212-219`) and zero-init of the last BN gamma in each residual branch.

The backbone doubles as the detection backbone: ``__call__`` with
``return_features=True`` yields the four stage outputs (C2..C5) for FPN,
honouring ``frozen_stages`` / ``norm_eval`` semantics of the detection
config (reference ``mmdet/models/backbones/resnet.py``) via the
``train_backbone`` flag.
"""
from __future__ import annotations

from functools import partial
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from iif_tpu.models.layers import SEBlock, make_classifier_head

# torch kaiming_normal_(mode='fan_out', relu) for convs.
conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
# dtype rides through so post-BN activations stay in the compute dtype
# (bf16): flax computes the statistics in f32 internally and keeps
# params/stats f32, but without dtype= the OUTPUT promotes to f32 —
# doubling HBM traffic for every activation tensor in the trunk.
BatchNorm = partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5)


def make_norm(norm: str, train: bool, name: str, dtype=None,
              zero_scale: bool = False):
    """'bn' (default, global/sync batch stats), 'bn@G' (local BN over G
    batch groups — the reference's per-GPU-BN training dynamics, see
    iif_tpu/models/norm.py), or 'gn' (GroupNorm(32) — the reference's
    ``norm_cfg=dict(type='GN', num_groups=32)`` of configs/gn,
    configs/gn+ws and configs/scratch; GN has no running stats, so
    norm_eval/frozen-stat semantics are moot)."""
    si = (nn.initializers.zeros if zero_scale else nn.initializers.ones)
    if norm == "gn":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype,
                            scale_init=si, name=name)
    if norm.startswith("bn@"):
        from iif_tpu.models.norm import LocalBatchNorm, parse_bn_spec

        return LocalBatchNorm(groups=parse_bn_spec(norm),
                              use_running_average=not train,
                              momentum=0.9, epsilon=1e-5, dtype=dtype,
                              scale_init=si, name=name)
    return BatchNorm(use_running_average=not train, dtype=dtype,
                     scale_init=si, name=name)


def make_conv(conv_ws: bool):
    """nn.Conv, or the weight-standardized ConvWS of configs/gn+ws."""
    if conv_ws:
        from iif_tpu.models.layers import ConvWS

        return ConvWS
    return nn.Conv


class S2DStemConv(nn.Module):
    """Space-to-depth rewrite of the 7x7/s2 stem conv — bit-exact (same
    math, same parameter) but MXU-friendly: a 3-channel 7x7/s2 conv wastes
    the 128-lane contraction dimension, so fold 2x2 input blocks into
    channels (3 -> 12) and run an equivalent 4x4/s1 conv whose kernel is
    the zero-padded 8x8 rearrangement of the original 7x7 weights (the
    MLPerf-ResNet TPU stem transform). The parameter keeps the reference
    (7,7,C,64) shape and the ``conv1`` path, so pretrained torchvision /
    mmdet checkpoint ingestion is unchanged.

    Derivation: y[i,j] = sum_{u,v<8} W8[u,v] x[2i+u-4, 2j+v-4] where
    W8[1:,1:] = W7 (zero first row/col). With z[a,b,(p,q,c)] =
    x[2a+p,2b+q,c], that is a 4x4 stride-1 conv over z with asymmetric
    padding (2,1) and kernel K[s,t,(p,q,c)] = W8[2s+p, 2t+q, c].
    """

    features: int = 64
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            raise ValueError(
                f"s2d stem needs even H/W, got {h}x{w} (detection canvases "
                "are padded to /32; classification crops are even)")
        kernel = self.param("kernel", conv_init, (7, 7, c, self.features),
                            jnp.float32)
        k8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k = k8.reshape(4, 2, 4, 2, c, self.features)          # (s,p,t,q,c,o)
        k = k.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, self.features)
        z = x.reshape(b, h // 2, 2, w // 2, 2, c)
        z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        if self.dtype is not None:
            z = z.astype(self.dtype)
            k = k.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            z, k, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BasicBlockV1(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    use_se: bool = False
    norm: str = "bn"
    conv_ws: bool = False
    dtype: object = None

    expansion = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        Conv = make_conv(self.conv_ws)
        identity = x
        out = Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                   use_bias=False, kernel_init=conv_init,
                   dtype=self.dtype, name="conv1")(x)
        out = make_norm(self.norm, train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = Conv(self.planes, (3, 3), padding=1, use_bias=False,
                   kernel_init=conv_init, dtype=self.dtype,
                   name="conv2")(out)
        out = make_norm(self.norm, train, "bn2", self.dtype,
                        zero_scale=True)(out)
        if self.use_se:
            out = SEBlock(reduction=16, name="se")(out)
        if self.downsample:
            identity = Conv(self.planes, (1, 1), strides=self.stride,
                            use_bias=False, kernel_init=conv_init,
                            dtype=self.dtype, name="downsample_conv")(x)
            identity = make_norm(self.norm, train, "downsample_bn",
                                 self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """torchvision v1.5 bottleneck: stride on the 3x3 conv."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    use_se: bool = False
    # deformable 3x3 (mmdet ResNet dcn=dict(type='DCN'/'DCNv2'),
    # configs/dcn): the conv2 taps sample at learned offsets; the
    # offset (+mask) conv is zero-initialized so training starts as a
    # plain conv
    dcn: str = ""                 # '' | 'dcn' | 'dcnv2'
    norm: str = "bn"
    conv_ws: bool = False
    # backbone plugins (mmdet ResNet ``plugins``): GCNet ContextBlock
    # after conv3 (configs/gcnet, ratio 1/4 or 1/16) and
    # GeneralizedAttention after conv2 (configs/empirical_attention,
    # '0010'/'1111')
    gcb_ratio: float = 0.0        # 0 = off
    gen_attention: str = ""       # '' | '0010' | '1111'
    dtype: object = None

    expansion = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        Conv = make_conv(self.conv_ws)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        identity = x
        out = Conv(width, (1, 1), use_bias=False, kernel_init=conv_init,
                   dtype=self.dtype, name="conv1")(x)
        out = make_norm(self.norm, train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        if self.dcn:
            from iif_tpu.ops.deform import deform_conv2d

            n_off = 27 if self.dcn == "dcnv2" else 18
            off = nn.Conv(n_off, (3, 3), strides=self.stride, padding=1,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="conv2_offset")(out.astype(jnp.float32))
            offsets = off[..., :18].reshape(off.shape[:3] + (9, 2))
            mod = (jax.nn.sigmoid(off[..., 18:])
                   if self.dcn == "dcnv2" else None)
            w2 = self.param("conv2_weight", conv_init,
                            (3, 3, width, width))
            out = deform_conv2d(out, offsets,
                                w2.astype(out.dtype), modulation=mod,
                                stride=self.stride)
        else:
            out = Conv(width, (3, 3), strides=self.stride, padding=1,
                       feature_group_count=self.groups, use_bias=False,
                       kernel_init=conv_init, dtype=self.dtype,
                       name="conv2")(out)
        out = make_norm(self.norm, train, "bn2", self.dtype)(out)
        out = nn.relu(out)
        if self.gen_attention:
            from iif_tpu.models.layers import GeneralizedAttention

            out = GeneralizedAttention(
                attention_type=self.gen_attention,
                name="gen_attention")(out)
        out = Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                   kernel_init=conv_init, dtype=self.dtype,
                   name="conv3")(out)
        # zero-init last BN gamma (zero_init_residual, Goyal et al.)
        out = make_norm(self.norm, train, "bn3", self.dtype,
                        zero_scale=True)(out)
        if self.gcb_ratio:
            from iif_tpu.models.layers import ContextBlock

            out = ContextBlock(ratio=self.gcb_ratio, name="gcb")(out)
        if self.use_se:
            out = SEBlock(reduction=16, name="se")(out)
        if self.downsample:
            identity = Conv(self.planes * self.expansion, (1, 1),
                            strides=self.stride, use_bias=False,
                            kernel_init=conv_init, dtype=self.dtype,
                            name="downsample_conv")(x)
            identity = make_norm(self.norm, train, "downsample_bn",
                                 self.dtype)(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """ResNet v1.5 trunk + classifier head (or multi-scale features).

    ``dtype``: computation dtype for convs (params stay fp32; BN stats
    accumulate fp32) — bf16 is the TPU-native mixed precision replacing
    the reference's apex AMP."""

    layers: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"  # 'basic' | 'bottleneck'
    num_classes: int = 1000
    use_norm: Optional[str] = None
    groups: int = 1
    width_per_group: int = 64
    use_se: bool = False
    # Detection-backbone knobs (reference mmdet ResNet: frozen_stages=1,
    # norm_eval=True in every IIF config). frozen_stages stops gradients
    # AND stats updates for the stem + stages <= frozen_stages (the
    # reference's requires_grad=False); norm_eval keeps every BN in eval
    # mode even in train (running stats only, affine still trained).
    frozen_stages: int = -1
    norm_eval: bool = False
    # per-stage deformable-conv flags, e.g. ('', 'dcn', 'dcn', 'dcn')
    # (mmdet configs/dcn: stage_with_dcn=(False, True, True, True))
    dcn_stages: Sequence[str] = ()
    dtype: object = None
    # rematerialize residual blocks in the backward (jax.checkpoint):
    # trades ~1/3 extra forward FLOPs for dropping per-block activations
    # — lets cascade-R101-class models fit larger per-chip batches
    remat: bool = False
    # 'bn' | 'gn' trunk norm + weight-standardized convs (the reference's
    # configs/gn, configs/gn+ws, configs/scratch recipes)
    norm: str = "bn"
    conv_ws: bool = False
    # per-stage plugin flags (mmdet ``plugins`` stages tuples):
    # GCNet ContextBlock (configs/gcnet c3-c5) and GeneralizedAttention
    # (configs/empirical_attention)
    gcb_stages: Sequence[bool] = ()
    gcb_ratio: float = 0.25
    gen_attention_stages: Sequence[bool] = ()
    gen_attention: str = "1111"
    # C4-style truncation (mmdet ResNet num_stages=3, out_indices=(2,)
    # in configs/_base_/models/faster_rcnn_r50_caffe_c4.py): stop after
    # this many stages; res5 then runs per-RoI as the shared head
    # (see ResLayer below)
    num_stages: int = 4
    # exact space-to-depth stem rewrite (see S2DStemConv); same params,
    # same outputs — a pure TPU layout optimization
    s2d_stem: bool = False

    def stage_widths(self) -> List[int]:
        return [64, 128, 256, 512]

    @property
    def expansion(self) -> int:
        return 4 if self.block == "bottleneck" else 1

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        return_features: bool = False,
    ) -> Union[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        import jax

        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlockV1
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # Stem: 7x7/2 + maxpool 3x3/2.
        stem_train = train and self.frozen_stages < 0 and not self.norm_eval
        if self.s2d_stem and not self.conv_ws:
            out = S2DStemConv(64, dtype=self.dtype, name="conv1")(x)
        else:
            out = make_conv(self.conv_ws)(
                64, (7, 7), strides=2, padding=3, use_bias=False,
                kernel_init=conv_init, dtype=self.dtype, name="conv1")(x)
        out = make_norm(self.norm, stem_train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            # requires_grad=False equivalent: no backward through the stem
            out = jax.lax.stop_gradient(out)

        feats = []
        for stage, (planes, n_blocks) in enumerate(
                zip(self.stage_widths()[:self.num_stages],
                    self.layers[:self.num_stages]), start=1):
            stage_train = (train and stage > self.frozen_stages
                           and not self.norm_eval)
            stride = 1 if stage == 1 else 2
            for i in range(n_blocks):
                first = i == 0
                downsample = first and (
                    stride != 1 or out.shape[-1] != planes * self.expansion)
                cls = block_cls
                if self.remat and stage > self.frozen_stages:
                    cls = nn.remat(block_cls, static_argnums=(2,))
                if self.block == "bottleneck":
                    dcn = (self.dcn_stages[stage - 1]
                           if len(self.dcn_stages) >= stage else "")
                    gcb = (self.gcb_ratio
                           if len(self.gcb_stages) >= stage
                           and self.gcb_stages[stage - 1] else 0.0)
                    ga = (self.gen_attention
                          if len(self.gen_attention_stages) >= stage
                          and self.gen_attention_stages[stage - 1] else "")
                    blk = cls(
                        planes, stride if first else 1, downsample,
                        groups=self.groups, base_width=self.width_per_group,
                        use_se=self.use_se, dcn=dcn, norm=self.norm,
                        conv_ws=self.conv_ws, gcb_ratio=gcb,
                        gen_attention=ga, dtype=self.dtype,
                        name=f"layer{stage}_{i}")
                else:
                    blk = cls(
                        planes, stride if first else 1, downsample,
                        use_se=self.use_se, norm=self.norm,
                        conv_ws=self.conv_ws, dtype=self.dtype,
                        name=f"layer{stage}_{i}")
                out = blk(out, stage_train)
            if stage <= self.frozen_stages:
                out = jax.lax.stop_gradient(out)
            feats.append(out)

        if return_features:
            return tuple(feats)

        out = out.mean(axis=(1, 2))
        head = make_classifier_head(self.num_classes, self.use_norm)
        return head(out)


class ResLayer(nn.Module):
    """res5 as a standalone per-RoI trunk — the reference's shared head
    (``mmdet/models/roi_heads/shared_heads/res_layer.py``): C4 detectors
    run stages 1-3 in the backbone, RoIAlign 14x14 on the C4 map, and
    apply this stage-4 layer to every RoI (14x14 -> 7x7, stride 2).
    ``norm_eval=True`` mirrors the reference default — BN runs on
    running stats even in training (affine still trains)."""

    block: str = "bottleneck"        # 'basic' | 'bottleneck'
    n_blocks: int = 3                # layers[3] of the depth
    planes: int = 512
    stride: int = 2
    norm_eval: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlockV1
        if self.dtype is not None:
            x = x.astype(self.dtype)
        stage_train = train and not self.norm_eval
        for i in range(self.n_blocks):
            first = i == 0
            blk = block_cls(self.planes, self.stride if first else 1,
                            downsample=first, dtype=self.dtype,
                            name=f"layer4_{i}")
            x = blk(x, stage_train)
        return x


# ------------------------------------------------------------- constructors
def resnet18(num_classes=1000, use_norm=None, **kw):
    return ResNet((2, 2, 2, 2), "basic", num_classes, use_norm, **kw)


def resnet34(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 6, 3), "basic", num_classes, use_norm, **kw)


def resnet50(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 6, 3), "bottleneck", num_classes, use_norm, **kw)


def resnet101(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 23, 3), "bottleneck", num_classes, use_norm, **kw)


def resnet152(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 8, 36, 3), "bottleneck", num_classes, use_norm, **kw)


def resnext50_32x4d(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 6, 3), "bottleneck", num_classes, use_norm,
                  groups=32, width_per_group=4, **kw)


def resnext101_32x8d(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 23, 3), "bottleneck", num_classes, use_norm,
                  groups=32, width_per_group=8, **kw)


def wide_resnet50_2(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 6, 3), "bottleneck", num_classes, use_norm,
                  width_per_group=128, **kw)


def wide_resnet101_2(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 23, 3), "bottleneck", num_classes, use_norm,
                  width_per_group=128, **kw)


def se_resnet50(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 6, 3), "bottleneck", num_classes, use_norm,
                  use_se=True, **kw)


def se_resnext50_32x4d(num_classes=1000, use_norm=None, **kw):
    return ResNet((3, 4, 6, 3), "bottleneck", num_classes, use_norm,
                  groups=32, width_per_group=4, use_se=True, **kw)
