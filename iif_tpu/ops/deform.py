"""Bilinear sampling ops: grid/point sampling, deformable convolution,
and multi-scale deformable attention — the XLA-native equivalents of the
mmcv CUDA ops ``point_sample``, ``DeformConv2d`` and
``MultiScaleDeformableAttention`` (SURVEY §2.4 deferred ○-family ops;
call sites ``mmdet/models/roi_heads/mask_heads/mask_point_head.py:7``,
``mmdet/models/dense_heads/reppoints_head.py:4``,
``mmdet/models/utils/transformer.py`` Deformable-DETR).

TPU formulation: a bilinear tap is four gathers + a weighted sum; all
taps across positions/heads/kernel cells batch into a single flat gather
per corner, which XLA lowers to an efficient dynamic-gather — no scalar
loops. Out-of-range taps contribute zero (the CUDA ops' zero-padding
semantics, matching ``F.grid_sample(padding_mode='zeros',
align_corners=False)`` for the attention variant).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(feat: jnp.ndarray,   # (H, W, C)
                    ys: jnp.ndarray,     # (...,) pixel coords
                    xs: jnp.ndarray) -> jnp.ndarray:   # (..., C)
    """Bilinear taps at absolute pixel coordinates (0-indexed, pixel
    centers at integers — the mmcv DeformConv / torchvision convention).
    Out-of-image taps are zero."""
    h, w, c = feat.shape
    shape = ys.shape
    ys = ys.reshape(-1)
    xs = xs.reshape(-1)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = feat.reshape(h * w, c)

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        return jnp.where(ok[:, None], flat[idx], 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    out = (v00 * ((1 - wy1) * (1 - wx1))[:, None]
           + v01 * ((1 - wy1) * wx1)[:, None]
           + v10 * (wy1 * (1 - wx1))[:, None]
           + v11 * (wy1 * wx1)[:, None])
    return out.reshape(shape + (c,))


def bilinear_sample_batched(feat: jnp.ndarray,   # (B, H, W, C)
                            b_idx: jnp.ndarray,  # (...,) int image index
                            ys: jnp.ndarray,     # (...,) pixel coords
                            xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear taps where each point carries its own batch index — one
    flat gather over (B*H*W, C) instead of a per-image vmap (used by
    RoI-point sampling where rois of different images interleave)."""
    b, h, w, c = feat.shape
    shape = ys.shape
    ys = ys.reshape(-1)
    xs = xs.reshape(-1)
    bi = b_idx.reshape(-1).astype(jnp.int32)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    flat = feat.reshape(b * h * w, c)

    def tap(yy, xx):
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = (bi * h + jnp.clip(yy, 0, h - 1)) * w + jnp.clip(xx, 0, w - 1)
        return jnp.where(ok[:, None], flat[idx], 0.0)

    out = (tap(y0i, x0i) * ((1 - wy1) * (1 - wx1))[:, None]
           + tap(y0i, x0i + 1) * ((1 - wy1) * wx1)[:, None]
           + tap(y0i + 1, x0i) * (wy1 * (1 - wx1))[:, None]
           + tap(y0i + 1, x0i + 1) * (wy1 * wx1)[:, None])
    return out.reshape(shape + (c,))


def point_sample(feat: jnp.ndarray,      # (B, H, W, C)
                 points: jnp.ndarray,    # (B, P, 2) normalized [0,1] (x,y)
                 ) -> jnp.ndarray:       # (B, P, C)
    """mmcv ``point_sample`` (grid_sample align_corners=False on [0,1]
    normalized point coords): pixel = p * size - 0.5."""
    h, w = feat.shape[1:3]

    def _one(f, pts):
        xs = pts[:, 0] * w - 0.5
        ys = pts[:, 1] * h - 0.5
        return bilinear_sample(f, ys, xs)

    return jax.vmap(_one)(feat, points)


def deform_conv2d(x: jnp.ndarray,        # (B, H, W, Cin)
                  offsets: jnp.ndarray,  # (B, Ho, Wo, K, 2) (dy, dx)/tap
                  weight: jnp.ndarray,   # (kh, kw, Cin, Cout)
                  bias: jnp.ndarray = None,
                  modulation: jnp.ndarray = None,   # (B, Ho, Wo, K) DCNv2
                  stride: int = 1,
                  ) -> jnp.ndarray:      # (B, Ho, Wo, Cout)
    """DeformConv2d (mmcv ``deform_conv2d`` /
    ``modulated_deform_conv2d``, pad k//2, dilation 1, one offset
    group): each kernel tap samples at ``p + p_k + Δp_k`` bilinearly —
    DCNv2 additionally scales each tap by a sigmoid ``modulation`` mask
    — then the taps contract with the kernel on the MXU (one
    (BHW·K, Cin) x (Cin, Cout) einsum). ``stride`` places the output
    grid at every ``stride``-th input position (the first block of a
    DCN ResNet stage)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    ky, kx = jnp.meshgrid(jnp.arange(kh) - kh // 2,
                          jnp.arange(kw) - kw // 2, indexing="ij")
    ky = ky.reshape(-1).astype(x.dtype)
    kx = kx.reshape(-1).astype(x.dtype)
    ho = -(-h // stride)
    wo = -(-w // stride)
    yy, xx = jnp.meshgrid(
        jnp.arange(ho, dtype=x.dtype) * stride,
        jnp.arange(wo, dtype=x.dtype) * stride, indexing="ij")

    def _one(feat, off, mod):
        ys = yy[:, :, None] + ky[None, None] + off[..., 0]   # (H, W, K)
        xs = xx[:, :, None] + kx[None, None] + off[..., 1]
        taps = bilinear_sample(feat, ys, xs)                 # (H, W, K, C)
        if mod is not None:
            taps = taps * mod[..., None]
        return jnp.einsum("hwkc,kcd->hwd", taps,
                          weight.reshape(k, cin, cout),
                          preferred_element_type=jnp.float32
                          ).astype(feat.dtype)

    if modulation is None:
        out = jax.vmap(lambda f, o: _one(f, o, None))(
            x, offsets.astype(x.dtype))
    else:
        out = jax.vmap(_one)(x, offsets.astype(x.dtype),
                             modulation.astype(x.dtype))
    if bias is not None:
        out = out + bias
    return out


def ms_deform_attention(
    values: Sequence[jnp.ndarray],       # per level (B, H_l, W_l, C)
    sampling_locs: jnp.ndarray,          # (B, Q, heads, L, P, 2) in [0,1]
    attn_weights: jnp.ndarray,           # (B, Q, heads, L, P) softmaxed
    num_heads: int,
) -> jnp.ndarray:                        # (B, Q, C)
    """MultiScaleDeformableAttention's sampling core
    (``mmcv/ops/multi_scale_deform_attn.py``
    ``multi_scale_deformable_attn_pytorch``): per head, bilinearly sample
    each level's value map at the predicted locations (grid_sample
    align_corners=False semantics) and reduce with attention weights."""
    b, q, heads, num_levels, points, _ = sampling_locs.shape
    c = values[0].shape[-1]
    dim_h = c // num_heads
    out = jnp.zeros((b, q, heads, dim_h), jnp.float32)
    for lvl, v in enumerate(values):
        h, w = v.shape[1:3]
        vh = v.reshape(b, h, w, num_heads, dim_h)
        locs = sampling_locs[:, :, :, lvl]                  # (B,Q,heads,P,2)
        xs = locs[..., 0] * w - 0.5
        ys = locs[..., 1] * h - 0.5

        def _one(vimg, ys_i, xs_i):
            # vimg (H, W, heads, dh); coords (Q, heads, P)
            def _head(vhd, yh, xh):
                return bilinear_sample(vhd, yh, xh)          # (Q, P, dh)

            return jax.vmap(_head, in_axes=(2, 1, 1), out_axes=1)(
                vimg, ys_i, xs_i)                            # (Q, heads, P, dh)

        taps = jax.vmap(_one)(vh, ys, xs)                    # (B,Q,heads,P,dh)
        wts = attn_weights[:, :, :, lvl][..., None]
        out = out + (taps.astype(jnp.float32) * wts).sum(3)
    return out.reshape(b, q, heads * dim_h)


def carafe_upsample(x: jnp.ndarray,        # (B, H, W, C)
                    masks: jnp.ndarray,    # (B, sH, sW, k*k) softmaxed
                    up_kernel: int = 5,
                    scale: int = 2) -> jnp.ndarray:   # (B, sH, sW, C)
    """CARAFE content-aware reassembly (the mmcv ``CARAFEPack`` CUDA
    op's core, SURVEY §2.4; call site ``mmdet/models/necks/fpn_carafe``):
    each upsampled pixel is a predicted-kernel weighted sum of the
    ``up_kernel x up_kernel`` source neighborhood around its low-res
    parent. TPU formulation: one conv_general_dilated_patches unfold +
    a (k*k)-contraction einsum — both MXU/fusion friendly."""
    b, h, w, c = x.shape
    k = up_kernel
    patches = jax.lax.conv_general_dilated_patches(
        x, (k, k), (1, 1), [(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))   # (B, H, W, C*k*k)
    patches = patches.reshape(b, h, w, c, k * k)
    # nearest-upsample the patches to output res (each output pixel's
    # neighborhood is its low-res parent's)
    patches = jnp.repeat(jnp.repeat(patches, scale, 1), scale, 2)
    return jnp.einsum("bhwck,bhwk->bhwc", patches,
                      masks.astype(patches.dtype))
