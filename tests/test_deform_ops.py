"""Bilinear sampling op family vs torch grid_sample oracles:
point_sample, deform_conv2d, ms_deform_attention (the mmcv
``multi_scale_deformable_attn_pytorch`` fallback transcribed in torch)."""
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from iif_tpu.ops.deform import (
    bilinear_sample,
    deform_conv2d,
    ms_deform_attention,
    point_sample,
)


def test_point_sample_matches_grid_sample():
    rng = np.random.RandomState(0)
    feat = rng.randn(2, 9, 13, 5).astype(np.float32)
    pts = rng.uniform(0, 1, (2, 40, 2)).astype(np.float32)
    ours = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(pts)))

    t_feat = torch.from_numpy(feat).permute(0, 3, 1, 2)
    grid = torch.from_numpy(pts) * 2 - 1        # [0,1] -> [-1,1]
    ref = F.grid_sample(t_feat, grid[:, None], align_corners=False,
                        padding_mode="zeros")[:, :, 0]   # (B, C, P)
    ref = ref.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bilinear_sample_zero_outside():
    feat = jnp.ones((4, 4, 2))
    out = np.asarray(bilinear_sample(
        feat, jnp.asarray([-2.0, 1.0, 5.0]), jnp.asarray([1.0, 1.0, 1.0])))
    assert out[0].max() == 0.0
    assert out[2].max() == 0.0
    np.testing.assert_allclose(out[1], 1.0)


def _deform_conv_torch(x, offsets, weight):
    """DeformConv2d v1 as explicit grid_sample taps + contraction — the
    algorithm mmcv's CUDA kernel implements (zero padding, taps at
    p + p_k + dp_k, pixel centers at integers)."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    k = kh * kw
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)
    ky, kx = np.meshgrid(np.arange(kh) - kh // 2,
                         np.arange(kw) - kw // 2, indexing="ij")
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    out = np.zeros((b, h, w, cout), np.float32)
    for ki in range(k):
        ys = yy[None] + ky.ravel()[ki] + offsets[..., ki, 0]
        xs = xx[None] + kx.ravel()[ki] + offsets[..., ki, 1]
        # normalized grid, align_corners=False: (x + 0.5) / W * 2 - 1
        gx = (torch.from_numpy(xs.astype(np.float32)) + 0.5) / w * 2 - 1
        gy = (torch.from_numpy(ys.astype(np.float32)) + 0.5) / h * 2 - 1
        grid = torch.stack([gx, gy], dim=-1)
        taps = F.grid_sample(tx, grid, align_corners=False,
                             padding_mode="zeros")      # (B, C, H, W)
        wk = torch.from_numpy(weight[ki // kw, ki % kw])  # (Cin, Cout)
        out += torch.einsum("bchw,cd->bhwd", taps, wk).numpy()
    return out


def test_deform_conv2d_matches_torch_taps():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 10, 4).astype(np.float32)
    offsets = (rng.randn(2, 8, 10, 9, 2) * 1.5).astype(np.float32)
    weight = (rng.randn(3, 3, 4, 6) * 0.1).astype(np.float32)
    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(weight)))
    ref = _deform_conv_torch(x, offsets, weight)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_deform_conv_zero_offsets_equals_conv():
    """With zero offsets DeformConv == plain 3x3 same-pad conv."""
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 8, 3).astype(np.float32)
    weight = (rng.randn(3, 3, 3, 5) * 0.1).astype(np.float32)
    ours = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.zeros((1, 8, 8, 9, 2)), jnp.asarray(weight)))
    import jax

    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-4, atol=1e-4)


def _msda_torch(values, shapes, locs, wts):
    """mmcv ``multi_scale_deformable_attn_pytorch`` transcribed."""
    b, _, heads, dh = values.shape
    _, q, _, L, P, _ = locs.shape
    v_list = values.split([h * w for h, w in shapes], dim=1)
    out = []
    for lvl, (h, w) in enumerate(shapes):
        v = v_list[lvl].flatten(2).transpose(1, 2).reshape(
            b * heads, dh, h, w)
        g = locs[:, :, :, lvl] * 2 - 1          # (B, Q, heads, P, 2)
        g = g.transpose(1, 2).flatten(0, 1)     # (B*heads, Q, P, 2)
        sampled = F.grid_sample(v, g, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        out.append(sampled)                     # (B*heads, dh, Q, P)
    wts_t = wts.transpose(1, 2).reshape(b * heads, 1, q, L * P)
    agg = (torch.stack(out, dim=-2).flatten(-2) * wts_t).sum(-1)
    return agg.view(b, heads * dh, q).transpose(1, 2).contiguous()


def test_ms_deform_attention_matches_mmcv_pytorch():
    rng = np.random.RandomState(3)
    b, q, heads, dh, P = 2, 7, 4, 8, 3
    shapes = [(6, 8), (3, 4)]
    L = len(shapes)
    vals = [rng.randn(b, h, w, heads * dh).astype(np.float32)
            for h, w in shapes]
    locs = rng.uniform(0, 1, (b, q, heads, L, P, 2)).astype(np.float32)
    wts = rng.uniform(0, 1, (b, q, heads, L, P)).astype(np.float32)
    wts = wts / wts.sum((-1, -2), keepdims=True)

    ours = np.asarray(ms_deform_attention(
        [jnp.asarray(v) for v in vals], jnp.asarray(locs),
        jnp.asarray(wts), heads))

    t_values = torch.cat(
        [torch.from_numpy(v).reshape(b, -1, heads, dh) for v in vals],
        dim=1)
    ref = _msda_torch(t_values, shapes, torch.from_numpy(locs),
                      torch.from_numpy(wts)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
