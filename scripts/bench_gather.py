"""Micro-bench RoIAlign gather formulations + mask-target variants on TPU.

Shapes: LVIS recipe (b4, 800x1344 canvas, FPN 256ch bf16, R=2048 7x7 rois
/ 512 14x14 mask rois, gt masks at stride 2).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=20, label=""):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    dt = (time.time() - t0) / iters * 1000
    print(f"{label}: {dt:.2f} ms", flush=True)
    return dt


def main():
    B, C = 4, 256
    H, W = 800, 1344
    R = 2048
    rng = np.random.RandomState(0)
    shapes = [(H // s, W // s) for s in (4, 8, 16, 32)]
    feats = [jnp.asarray(rng.randn(B, h, w, C), jnp.bfloat16)
             for h, w in shapes]
    heights = np.array([h for h, w in shapes])
    widths = np.array([w for h, w in shapes])
    offsets = np.concatenate([[0], np.cumsum(heights * widths)])[:-1]
    tot = int((heights * widths).sum())

    # random taps: R rois x 14x14 samples, random level
    Ty = Tx = 14
    lv = rng.randint(0, 4, R)
    ys = rng.rand(R, Ty).astype(np.float32) * (heights[lv][:, None] - 1)
    xs = rng.rand(R, Tx).astype(np.float32) * (widths[lv][:, None] - 1)
    off = offsets[lv].astype(np.int32)
    wint = widths[lv].astype(np.int32)
    bidx = rng.randint(0, B, R).astype(np.int32)

    y0 = np.floor(ys).astype(np.int32)
    x0 = np.floor(xs).astype(np.int32)
    idx00 = (off[:, None, None] + y0[:, :, None] * wint[:, None, None]
             + x0[:, None, :])                       # (R, Ty, Tx)
    idx00 = jnp.asarray(idx00)
    bidx_j = jnp.asarray(bidx)

    flat3 = jnp.concatenate([f.reshape(B, -1, C) for f in feats], axis=1)
    flat2 = flat3.reshape(B * tot, C)
    gidx = bidx_j[:, None, None] * tot + idx00       # global row ids

    # V0: 2D advanced indexing (current formulation, one corner)
    @jax.jit
    def v0(flat3):
        return flat3[bidx_j[:, None, None], idx00]

    # V1: fold batch, 1D row gather
    @jax.jit
    def v1(flat2):
        return flat2[gidx]

    # V2: jnp.take along axis 0
    @jax.jit
    def v2(flat2):
        return jnp.take(flat2, gidx.reshape(-1), axis=0)

    # V3: four corners in ONE gather (simulated: 4x indices)
    gidx4 = jnp.stack([gidx, gidx + 1, gidx + 2, gidx + 3])

    @jax.jit
    def v3(flat2):
        return flat2[gidx4]

    print(f"one-corner gather = {R * Ty * Tx} rows of {C} bf16", flush=True)
    timed(v0, (flat3,), label="V0 2D advanced indexing")
    timed(v1, (flat2,), label="V1 folded 1D row gather")
    timed(v2, (flat2,), label="V2 jnp.take axis0")
    timed(v3, (flat2,), label="V3 4-corner single gather (4x rows)")

    # V4: backward of V1 (scatter-add)
    @jax.jit
    def v4(flat2):
        return jax.grad(
            lambda f: f[gidx].astype(jnp.float32).sum())(flat2).sum()

    timed(v4, (flat2,), label="V1 fwd+bwd (gather+scatter)")

    # ------------- mask targets: current vs one-hot matmul
    G, s = 100, 2
    Hm, Wm = H // s, W // s
    gt_masks = jnp.asarray(rng.rand(B, G, Hm, Wm) < 0.2)
    Rp = 512
    S = 28
    rois = np.zeros((Rp, 5), np.float32)
    rois[:, 0] = rng.randint(0, B, Rp)
    rois[:, 1] = rng.rand(Rp) * (W - 300)
    rois[:, 2] = rng.rand(Rp) * (H - 300)
    rois[:, 3] = rois[:, 1] + 30 + rng.rand(Rp) * 250
    rois[:, 4] = rois[:, 2] + 30 + rng.rand(Rp) * 250
    rois = jnp.asarray(rois)
    pos_gt = jnp.asarray(rng.randint(0, G, Rp))

    from iif_tpu.detection.mask_head import mask_targets

    @jax.jit
    def m0(gm):
        return mask_targets(rois, pos_gt, gm.astype(jnp.uint8), S,
                            gt_stride=s)

    timed(m0, (gt_masks,), iters=5, label="mask_targets current (512 rois)")

    # one-hot separable: crop = Wy @ M @ Wx^T per roi
    @jax.jit
    def m1(gm):
        b, g, hm, wm = gm.shape
        flat = gm.reshape(b * g, hm, wm)
        sel = flat[rois[:, 0].astype(jnp.int32) * g + pos_gt]  # (R, Hm, Wm)
        sel = sel.astype(jnp.bfloat16)
        scale = 1.0 / s
        x1 = rois[:, 1] * scale - 0.5
        y1 = rois[:, 2] * scale - 0.5
        x2 = rois[:, 3] * scale - 0.5
        y2 = rois[:, 4] * scale - 0.5
        nsamp = 2 * S
        iy = (jnp.arange(nsamp, dtype=jnp.float32) + 0.5) / (2.0)
        ysamp = y1[:, None] + (y2 - y1)[:, None] / S * iy[None] / 1.0
        # actually: sample grid = y1 + bin_h * (j + .5)/2, bin_h=(y2-y1)/S
        jj = (jnp.arange(nsamp, dtype=jnp.float32) + 0.5) / 2.0
        ysamp = y1[:, None] + (y2 - y1)[:, None] / S * jj[None]
        xsamp = x1[:, None] + (x2 - x1)[:, None] / S * jj[None]
        ysamp = jnp.clip(ysamp, 0.0, hm - 1.0)
        xsamp = jnp.clip(xsamp, 0.0, wm - 1.0)
        hgrid = jnp.arange(hm, dtype=jnp.float32)
        wgrid = jnp.arange(wm, dtype=jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(
            ysamp[:, :, None] - hgrid[None, None, :]))    # (R, 2S, Hm)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(
            xsamp[:, :, None] - wgrid[None, None, :]))    # (R, 2S, Wm)
        # average the 2 samples per bin
        wy = wy.reshape(Rp, S, 2, hm).mean(2).astype(jnp.bfloat16)
        wx = wx.reshape(Rp, S, 2, wm).mean(2).astype(jnp.bfloat16)
        a = jnp.einsum("rph,rhw->rpw", wy, sel)
        crops = jnp.einsum("rpw,rqw->rpq", a, wx)
        return (crops.astype(jnp.float32) >= 0.5).astype(jnp.float32)

    timed(m1, (gt_masks,), iters=5, label="mask_targets one-hot matmul")

    # numeric agreement check
    a = np.asarray(m0(gt_masks))
    b = np.asarray(m1(gt_masks))
    print("mask target agreement:", (a == b).mean(), flush=True)


if __name__ == "__main__":
    main()
