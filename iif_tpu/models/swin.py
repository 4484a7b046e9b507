"""Swin Transformer backbone, flax/NHWC, TPU-native.

Rebuild of the reference's Swin
(``mmdet/models/backbones/swin.py``: WindowMSA :20-123, ShiftWindowMSA
:126-284, SwinBlock :286-377, SwinBlockSequence :379-463,
SwinTransformer :465+; configs ``configs/swin/mask_rcnn_swin-t-p4-w7*``):
patch-embed 4x4 -> 4 stages of shifted-window attention blocks with
relative-position bias, patch-merging downsampling between stages, and a
LayerNorm on each requested output.

TPU-first mapping: window partition is a reshape/transpose (layout-only,
fused by XLA); each W-MSA is one batched (B*nW, w^2, C) attention — three
MXU matmuls — so the whole backbone is matmul-bound. The shifted-window
attention mask depends only on the (static) padded feature size, so it is
precomputed in numpy at trace time and closed over as a constant;
``jnp.roll`` implements the cyclic shift. Stochastic depth (DropPath)
draws from the flax 'dropout' rng collection in train mode.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

trunc_normal = nn.initializers.truncated_normal(0.02)


def _rel_position_index(ws: int) -> np.ndarray:
    """Relative position index table (``swin.py:58-67``), (ws^2, ws^2)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))          # (2, ws, ws)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]              # (2, n, n)
    rel = rel.transpose(1, 2, 0)                           # (n, n, 2)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)                                     # (n, n)


def _shift_attn_mask(h_pad: int, w_pad: int, ws: int,
                     shift: int) -> np.ndarray:
    """SW-MSA mask (``swin.py:197-218``): (nW, ws^2, ws^2) with 0 for
    same-region pairs and -100 across regions. Static — the padded
    feature size is a compile-time constant."""
    img = np.zeros((h_pad, w_pad), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h_pad // ws, ws, w_pad // ws, ws) \
        .transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(x: jnp.ndarray, h: int, w: int, ws: int,
                    b: int) -> jnp.ndarray:
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, x.shape[-1])


class WindowMSA(nn.Module):
    """``swin.py:20-123``: multi-head attention inside each window with a
    learned relative-position bias."""
    embed_dims: int
    num_heads: int
    window_size: int = 7
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        n_win, n, c = x.shape
        heads = self.num_heads
        hd = self.embed_dims // heads
        scale = hd ** -0.5
        ws = self.window_size
        bias_table = self.param(
            "relative_position_bias_table", trunc_normal,
            ((2 * ws - 1) ** 2, heads))
        rel_idx = _rel_position_index(ws)                  # np constant

        qkv = nn.Dense(self.embed_dims * 3, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(n_win, n, 3, heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]           # (nW, h, n, hd)
        attn = jnp.einsum("whqd,whkd->whqk", q, k)
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(
            n, n, heads).transpose(2, 0, 1)                # (h, n, n)
        attn = attn + rel_bias[None].astype(attn.dtype)
        if mask is not None:
            # mask (nW_img, n, n); windows repeat per batch image
            nw = mask.shape[0]
            attn = attn.reshape(-1, nw, heads, n, n) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(n_win, heads, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1) \
            .astype(v.dtype)
        out = jnp.einsum("whqk,whkd->whqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(n_win, n, c)
        return nn.Dense(self.embed_dims, dtype=self.dtype,
                        name="proj")(out)


def _drop_path(x: jnp.ndarray, rate: float, deterministic: bool,
               rng) -> jnp.ndarray:
    """Stochastic depth on the residual branch (per-sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0)


class SwinBlock(nn.Module):
    """``swin.py:286-377``: LN -> (S)W-MSA -> droppath residual, LN ->
    4x GELU MLP -> droppath residual."""
    embed_dims: int
    num_heads: int
    window_size: int = 7
    shift: bool = False
    mlp_ratio: int = 4
    drop_path: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int],
                 train: bool = False) -> jnp.ndarray:
        b, _, c = x.shape
        h, w = hw
        ws = self.window_size
        shift = ws // 2 if self.shift else 0

        def branch_attn(y):
            y = y.reshape(b, h, w, c)
            pad_b = (ws - h % ws) % ws
            pad_r = (ws - w % ws) % ws
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            hp, wp = h + pad_b, w + pad_r
            mask = None
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
                mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
            win = _window_partition(y, ws)
            win = WindowMSA(self.embed_dims, self.num_heads, ws,
                            dtype=self.dtype, name="attn")(win, mask)
            y = _window_reverse(win, hp, wp, ws, b)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            return y[:, :h, :w].reshape(b, h * w, c)

        att = branch_attn(nn.LayerNorm(name="norm1")(x))
        if train and self.drop_path > 0:
            att = _drop_path(att, self.drop_path, False,
                             self.make_rng("dropout"))
        x = x + att
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.embed_dims * self.mlp_ratio, dtype=self.dtype,
                     name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.embed_dims, dtype=self.dtype, name="mlp_fc2")(y)
        if train and self.drop_path > 0:
            y = _drop_path(y, self.drop_path, False,
                           self.make_rng("dropout"))
        return x + y


class PatchMerging(nn.Module):
    """2x2 concat + LN + linear 4C -> 2C (``swin.py`` PatchMerging via
    mmcv; odd sizes padded like the reference's unfold path)."""
    out_dims: int
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, hw: Tuple[int, int]
                 ) -> Tuple[jnp.ndarray, Tuple[int, int]]:
        b, _, c = x.shape
        h, w = hw
        x = x.reshape(b, h, w, c)
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        # sample order matches torch unfold/TL-BL-TR-BR convention of the
        # original implementation: [x0, x1, x2, x3] = rows even/odd
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, (hp // 2) * (wp // 2), 4 * c)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.Dense(self.out_dims, use_bias=False, dtype=self.dtype,
                     name="reduction")(x)
        return x, (hp // 2, wp // 2)


class SwinTransformer(nn.Module):
    """Swin-T/S/B trunk (``swin.py:465+``; mask_rcnn_swin-t config:
    embed_dims 96, depths (2,2,6,2), heads (3,6,12,24), window 7,
    drop_path 0.2, patch_norm, out_indices (0,1,2,3))."""
    embed_dims: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: int = 4
    drop_path_rate: float = 0.2
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    norm_eval: bool = False     # uniform surface; Swin has no BN stats
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 return_features: bool = True) -> List[jnp.ndarray]:
        b = x.shape[0]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # patch embed: 4x4/s4 conv + LN (patch_norm=True)
        x = nn.Conv(self.embed_dims, (4, 4), strides=(4, 4),
                    dtype=self.dtype, name="patch_embed")(x)
        h, w = x.shape[1], x.shape[2]
        x = nn.LayerNorm(name="patch_norm")(x.reshape(b, h * w, -1))
        hw = (h, w)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total).tolist()
        feats = []
        blk_i = 0
        dims = self.embed_dims
        for stage, depth in enumerate(self.depths):
            for i in range(depth):
                x = SwinBlock(dims, self.num_heads[stage],
                              self.window_size, shift=(i % 2 == 1),
                              mlp_ratio=self.mlp_ratio,
                              drop_path=dpr[blk_i], dtype=self.dtype,
                              name=f"stage{stage}_block{i}")(
                    x, hw, train and stage > self.frozen_stages)
                blk_i += 1
            if stage <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                out = nn.LayerNorm(name=f"out_norm{stage}")(x)
                feats.append(out.reshape(b, hw[0], hw[1], dims))
            if stage < len(self.depths) - 1:
                x, hw = PatchMerging(dims * 2, dtype=self.dtype,
                                     name=f"downsample{stage}")(x, hw)
                dims *= 2
        return feats


def swin_t(**kw) -> SwinTransformer:
    return SwinTransformer(embed_dims=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24), **kw)


def swin_s(**kw) -> SwinTransformer:
    return SwinTransformer(embed_dims=96, depths=(2, 2, 18, 2),
                           num_heads=(3, 6, 12, 24), **kw)


def swin_b(**kw) -> SwinTransformer:
    return SwinTransformer(embed_dims=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32), **kw)
