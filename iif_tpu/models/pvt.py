"""PVT / PVTv2 backbone (Pyramid Vision Transformer), NHWC flax.

Rebuild of ``mmdet/models/backbones/pvt.py``: 4 stages of
(overlapping-)patch embedding + transformer encoder layers with
SPATIAL-REDUCTION attention — the K/V maps are downsampled ``sr_ratio``x
by a strided conv before attention so the quadratic term stays bounded
— and a (PVTv2: depthwise-conv) MixFFN. PVT-tiny/small depths
(2,2,2,2)/(3,4,6,3), widths (64, 128, 320, 512), heads (1, 2, 5, 8),
sr_ratios (8, 4, 2, 1).

TPU notes: attention over (HW, C) tokens is batched MXU matmuls; the
spatial reduction keeps K/V at <= (HW/64) tokens on the big early
stages, exactly the reference's flop shape.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

PVT_ARCH = {
    "tiny": ((2, 2, 2, 2), (64, 128, 320, 512)),
    "small": ((3, 4, 6, 3), (64, 128, 320, 512)),
}
HEADS = (1, 2, 5, 8)
SR_RATIOS = (8, 4, 2, 1)
MLP_RATIOS = (8, 8, 4, 4)


class SRAttention(nn.Module):
    """``pvt.py:100-176`` SpatialReductionAttention."""
    dim: int
    num_heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, n, c = x.shape
        h, w = hw
        q = nn.Dense(self.dim, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            xm = x.reshape(b, h, w, c)
            xm = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                         strides=(self.sr_ratio, self.sr_ratio),
                         name="sr")(xm)
            kv_in = nn.LayerNorm(name="sr_norm")(
                xm.reshape(b, -1, self.dim))
        k = nn.Dense(self.dim, name="k")(kv_in)
        v = nn.Dense(self.dim, name="v")(kv_in)
        hd = self.dim // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd).transpose(
                0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(hd), -1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class MixFFN(nn.Module):
    """``pvt.py:21-99``: fc -> (PVTv2 depthwise 3x3) -> gelu -> fc."""
    dim: int
    hidden: int
    use_conv: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]) -> jnp.ndarray:
        b, n, c = x.shape
        h = nn.Dense(self.hidden, name="fc1")(x)
        if self.use_conv:
            hh, ww = hw
            hmap = h.reshape(b, hh, ww, self.hidden)
            hmap = nn.Conv(self.hidden, (3, 3), padding=1,
                           feature_group_count=self.hidden,
                           name="dwconv")(hmap)
            h = hmap.reshape(b, n, self.hidden)
        h = jax.nn.gelu(h)
        return nn.Dense(self.dim, name="fc2")(h)


class PVT(nn.Module):
    """``type='pvt-tiny' / 'pvt-small'`` backbone."""
    arch: str = "tiny"
    frozen_stages: int = -1
    norm_eval: bool = True
    use_conv_ffn: bool = False     # True = PVTv2
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = True):
        depths, widths = PVT_ARCH[self.arch]
        outs = []
        b = x.shape[0]
        for stage in range(4):
            patch = 4 if stage == 0 else 2
            x = nn.Conv(widths[stage], (patch, patch),
                        strides=(patch, patch),
                        name=f"patch_embed{stage}")(x)
            hh, ww = x.shape[1:3]
            t = nn.LayerNorm(name=f"embed_norm{stage}")(
                x.reshape(b, hh * ww, widths[stage]))
            # learned absolute positional embedding (PVTv1), stored at
            # the init resolution and bilinearly resized like the
            # reference's resize_pos_embed for other input sizes
            pos = self.param(f"pos_embed{stage}",
                             nn.initializers.truncated_normal(0.02),
                             (1, hh, ww, widths[stage]))
            if pos.shape[1:3] != (hh, ww):
                pos = jax.image.resize(
                    pos, (1, hh, ww, widths[stage]), "bilinear")
            t = t + pos.reshape(1, hh * ww, widths[stage])
            for blk in range(depths[stage]):
                name = f"s{stage}_b{blk}"
                t = t + SRAttention(
                    widths[stage], HEADS[stage], SR_RATIOS[stage],
                    name=f"{name}_attn")(
                    nn.LayerNorm(name=f"{name}_n1")(t), (hh, ww))
                t = t + MixFFN(
                    widths[stage],
                    widths[stage] * MLP_RATIOS[stage],
                    use_conv=self.use_conv_ffn,
                    name=f"{name}_ffn")(
                    nn.LayerNorm(name=f"{name}_n2")(t), (hh, ww))
            t = nn.LayerNorm(name=f"out_norm{stage}")(t)
            x = t.reshape(b, hh, ww, widths[stage])
            outs.append(x)
        return outs if return_features else outs[-1]
