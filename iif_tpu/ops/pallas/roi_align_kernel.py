"""Pallas TPU RoIAlign kernel.

The mmcv CUDA RoIAlign (SURVEY.md §2.4) assigns one thread per output
element doing four global-memory taps. On TPU the equivalent dataflow is:
per RoI, DMA a bounded feature window HBM->VMEM once, then compute ALL
output bins' bilinear taps from VMEM — four taps amortized over the whole
7x7xSxS grid, gathered via one-hot matmuls that run on the MXU.

Grid: one program per RoI. Window origins and boxes ride in scalar-prefetch
SMEM (``PrefetchScalarGridSpec``) so the kernel issues a dynamic sliced DMA
``features[b, oy:oy+W, ox:ox+W, :] -> VMEM`` before computing. The window
is a fixed WINDOW x WINDOW patch clamped to the feature bounds; at the FPN
level picked by ``map_roi_levels`` a RoI spans at most ~28 cells, so
WINDOW=32 covers every in-distribution RoI (larger RoIs clamp — their
outer taps clamp to the window edge, matching the XLA path's border
clamp within one cell).

Exposed as ``roi_align_pallas`` (forward, single level); falls back to the
XLA gather formulation off-TPU / for unsupported shapes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

WINDOW_Y = 32   # H dim: untiled, any offset
WINDOW_X = 40   # W dim: (8,128)-tiled in HBM -> origin aligned to 8


def _make_kernel(out_size: int, samples: int, feat_h: int, feat_w: int,
                 channels: int):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_taps = out_size * samples

    def kernel(boxes_ref, oy_ref, ox_ref, bidx_ref, feat_hbm, out_ref,
               scratch, sem):
        i = pl.program_id(0)
        oy = oy_ref[i]
        ox = ox_ref[i]
        b = bidx_ref[i]

        ox = pl.multiple_of(ox, 8)
        dma = pltpu.make_async_copy(
            feat_hbm.at[b, pl.ds(oy, WINDOW_Y), pl.ds(ox, WINDOW_X), :],
            scratch, sem)
        dma.start()

        x1 = boxes_ref[i, 0] - ox.astype(jnp.float32)
        y1 = boxes_ref[i, 1] - oy.astype(jnp.float32)
        x2 = boxes_ref[i, 2] - ox.astype(jnp.float32)
        y2 = boxes_ref[i, 3] - oy.astype(jnp.float32)
        bin_h = (y2 - y1) / out_size
        bin_w = (x2 - x1) / out_size

        grid = (jax.lax.broadcasted_iota(jnp.int32, (n_taps, 1), 0)[:, 0]
                .astype(jnp.float32) + 0.5) / samples
        ys = jnp.clip(y1 + bin_h * grid, 0.0, WINDOW_Y - 1.0)
        xs = jnp.clip(x1 + bin_w * grid, 0.0, WINDOW_X - 1.0)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, WINDOW_Y - 1)
        x1i = jnp.minimum(x0 + 1, WINDOW_X - 1)
        ly = (ys - y0.astype(jnp.float32))[:, None]
        lx = (xs - x0.astype(jnp.float32))[:, None]

        rows0 = jax.nn.one_hot(y0, WINDOW_Y, dtype=jnp.float32)
        rows1 = jax.nn.one_hot(y1i, WINDOW_Y, dtype=jnp.float32)
        cols0 = jax.nn.one_hot(x0, WINDOW_X, dtype=jnp.float32)
        cols1 = jax.nn.one_hot(x1i, WINDOW_X, dtype=jnp.float32)
        # blend row one-hots by ly -> one (n_taps, WINDOW) row-weight matrix
        row_w = rows0 * (1.0 - ly) + rows1 * ly
        col_w = cols0 * (1.0 - lx) + cols1 * lx

        dma.wait()
        feat = scratch[:]                        # (WY, WX, C)
        flat = feat.reshape(WINDOW_Y, WINDOW_X * channels)
        rowsel = jnp.dot(row_w, flat,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        rowsel = rowsel.reshape(n_taps, WINDOW_X, channels)
        # (n_taps_y, n_taps_x, C) = sum_w rowsel[y, w, c] * col_w[x, w]
        vals = jax.lax.dot_general(
            rowsel, col_w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)  # (n_taps, C, n_taps)
        vals = vals.transpose(0, 2, 1)            # (y_taps, x_taps, C)
        vals = vals.reshape(out_size, samples, out_size, samples, channels)
        out_ref[0] = vals.mean(axis=(1, 3))

    return kernel


@functools.partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                             "aligned", "spatial_scale"))
def _pallas_call(features, boxes, oy, ox, batch_idx, output_size,
                 sampling_ratio, aligned, spatial_scale):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = features.shape
    r = boxes.shape[0]
    out_h = output_size[0]
    s = sampling_ratio if sampling_ratio > 0 else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,     # boxes, oy, ox, batch_idx
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, out_h, out_h, c),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((WINDOW_Y, WINDOW_X, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = _make_kernel(out_h, s, h, w, c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, out_h, out_h, c), jnp.float32),
        grid_spec=grid_spec,
    )(boxes, oy, ox, batch_idx, features.astype(jnp.float32))


def roi_align_pallas(
    features: jnp.ndarray,     # (B, H, W, C)
    rois: jnp.ndarray,         # (R, 5)
    output_size: Tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """Pallas-backed RoIAlign forward; falls back to the XLA gather path
    off-TPU, for non-square outputs, or feature maps smaller than the DMA
    window."""
    from iif_tpu.ops.roi_align import roi_align as xla_roi_align

    out_h, out_w = output_size
    b, h, w, c = features.shape
    # c must be lane-aligned: the kernel reshapes (WY, WX, C)->(WY, WX*C),
    # which Mosaic only supports when WX*C folds into whole 128-lane tiles
    # (w - WINDOW_X) % 8: the x-origin clip upper bound must stay
    # 8-aligned or right-edge windows DMA misaligned (pl.multiple_of)
    if (out_h != out_w or jax.default_backend() not in ("tpu", "axon")
            or h < WINDOW_Y or w < WINDOW_X or c % 128
            or (w - WINDOW_X) % 8):
        return xla_roi_align(features, rois, output_size, spatial_scale,
                             sampling_ratio, aligned)

    offset = 0.5 if aligned else 0.0
    boxes = rois[:, 1:] * spatial_scale - offset
    batch_idx = rois[:, 0].astype(jnp.int32)
    oy = jnp.clip(jnp.floor(boxes[:, 1]), 0, h - WINDOW_Y).astype(jnp.int32)
    # x origin aligned down to the 8-sublane tile boundary (HBM tiling)
    ox = jnp.clip((jnp.floor(boxes[:, 0]) // 8) * 8, 0,
                  w - WINDOW_X).astype(jnp.int32)
    return _pallas_call(features, boxes, oy, ox, batch_idx,
                        tuple(output_size), sampling_ratio, aligned,
                        spatial_scale)


# --------------------------------------------------------------------------
# Backward kernel (mmcv roi_align_backward equivalent, SURVEY §2.4): the
# forward's two one-hot matmuls are transposed — per RoI,
#   dW[wy, wx, c] = sum_taps row_w[ty, wy] * col_w[tx, wx] * g[ty, tx, c]
# runs as two MXU dots producing the (WINDOW_Y, WINDOW_X, C) window
# gradient, which is accumulated into the grad buffer with a
# read-add-write DMA round trip. TPU pallas grid steps run sequentially
# on the core, so overlapping-window accumulation is race-free by
# construction (the write DMA completes before the next step's read).
# Box gradients are not produced (the reference CUDA op is features-only).
# --------------------------------------------------------------------------


def _make_bwd_kernel(out_size: int, samples: int, channels: int):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_taps = out_size * samples

    def kernel(boxes_ref, oy_ref, ox_ref, bidx_ref, g_ref, grad_hbm,
               out_alias, scratch, sem_in, sem_out):
        i = pl.program_id(0)
        oy = oy_ref[i]
        ox = ox_ref[i]
        b = bidx_ref[i]
        ox = pl.multiple_of(ox, 8)

        dma_in = pltpu.make_async_copy(
            grad_hbm.at[b, pl.ds(oy, WINDOW_Y), pl.ds(ox, WINDOW_X), :],
            scratch, sem_in)
        dma_in.start()

        x1 = boxes_ref[i, 0] - ox.astype(jnp.float32)
        y1 = boxes_ref[i, 1] - oy.astype(jnp.float32)
        x2 = boxes_ref[i, 2] - ox.astype(jnp.float32)
        y2 = boxes_ref[i, 3] - oy.astype(jnp.float32)
        bin_h = (y2 - y1) / out_size
        bin_w = (x2 - x1) / out_size

        grid = (jax.lax.broadcasted_iota(jnp.int32, (n_taps, 1), 0)[:, 0]
                .astype(jnp.float32) + 0.5) / samples
        ys = jnp.clip(y1 + bin_h * grid, 0.0, WINDOW_Y - 1.0)
        xs = jnp.clip(x1 + bin_w * grid, 0.0, WINDOW_X - 1.0)
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, WINDOW_Y - 1)
        x1i = jnp.minimum(x0 + 1, WINDOW_X - 1)
        ly = (ys - y0.astype(jnp.float32))[:, None]
        lx = (xs - x0.astype(jnp.float32))[:, None]
        rows0 = jax.nn.one_hot(y0, WINDOW_Y, dtype=jnp.float32)
        rows1 = jax.nn.one_hot(y1i, WINDOW_Y, dtype=jnp.float32)
        cols0 = jax.nn.one_hot(x0, WINDOW_X, dtype=jnp.float32)
        cols1 = jax.nn.one_hot(x1i, WINDOW_X, dtype=jnp.float32)
        row_w = rows0 * (1.0 - ly) + rows1 * ly      # (n_taps, WY)
        col_w = cols0 * (1.0 - lx) + cols1 * lx      # (n_taps, WX)

        # incoming grad (1, O, O, C) -> per-tap grad / samples^2 (the
        # forward's mean over the samples x samples sub-grid)
        g = g_ref[0].astype(jnp.float32) / float(samples * samples)
        g_taps = jnp.repeat(jnp.repeat(g, samples, axis=0), samples,
                            axis=1)                   # (n_taps, n_taps, C)

        # A[wy, tx, c] = sum_ty row_w[ty, wy] * g_taps[ty, tx, c]
        a = jax.lax.dot_general(
            row_w, g_taps.reshape(n_taps, n_taps * channels),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # (WY, n_taps*C)
        a = a.reshape(WINDOW_Y, n_taps, channels)
        # dW[wy, wx, c] = sum_tx col_w[tx, wx] * A[wy, tx, c]
        dw = jax.lax.dot_general(
            col_w, a,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # (WX, WY, C)
        dw = dw.transpose(1, 0, 2)                    # (WY, WX, C)

        dma_in.wait()
        scratch[:] = scratch[:] + dw
        dma_out = pltpu.make_async_copy(
            scratch,
            out_alias.at[b, pl.ds(oy, WINDOW_Y), pl.ds(ox, WINDOW_X), :],
            sem_out)
        dma_out.start()
        dma_out.wait()

    return kernel


@functools.partial(jax.jit, static_argnames=("feat_shape", "output_size",
                                             "sampling_ratio"))
def _pallas_bwd_call(g, boxes, oy, ox, batch_idx, feat_shape, output_size,
                     sampling_ratio):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = feat_shape
    r = boxes.shape[0]
    out_h = output_size[0]
    s = sampling_ratio if sampling_ratio > 0 else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(r,),
        in_specs=[
            pl.BlockSpec((1, out_h, out_h, c), lambda i, *_: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),     # g, pipelined
            pl.BlockSpec(memory_space=pltpu.ANY),      # grad accumulator
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((WINDOW_Y, WINDOW_X, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = _make_bwd_kernel(out_h, s, c)
    zeros = jnp.zeros((b, h, w, c), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), jnp.float32),
        grid_spec=grid_spec,
        input_output_aliases={5: 0},   # 4 scalar-prefetch + g -> grad buf
    )(boxes, oy, ox, batch_idx, g.astype(jnp.float32), zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def roi_align_pallas_grad(features, rois, output_size=(7, 7),
                          spatial_scale=1.0, sampling_ratio=2,
                          aligned=True):
    """Differentiable Pallas RoIAlign (fwd kernel + transposed-matmul bwd
    kernel). Same fallbacks as ``roi_align_pallas``; on the XLA fallback
    path autodiff applies (the gather scatter-add backward)."""
    return roi_align_pallas(features, rois, output_size, spatial_scale,
                            sampling_ratio, aligned)


def _rapg_fwd(features, rois, output_size, spatial_scale, sampling_ratio,
              aligned):
    out = roi_align_pallas_grad(features, rois, output_size, spatial_scale,
                                sampling_ratio, aligned)
    return out, (features, rois)


def _rapg_bwd(output_size, spatial_scale, sampling_ratio, aligned,
              res, g):
    features, rois = res
    b, h, w, c = features.shape
    out_h, out_w = output_size
    if (out_h != out_w or jax.default_backend() not in ("tpu", "axon")
            or h < WINDOW_Y or w < WINDOW_X or c % 128
            or (w - WINDOW_X) % 8):
        # XLA fallback path: differentiate the gather formulation (the
        # (w - WINDOW_X) % 8 clause must match the forward's guard so fwd
        # and bwd take the same path — a non-8-multiple ox clip bound would
        # violate the pl.multiple_of(ox, 8) promise in the bwd kernel)
        from iif_tpu.ops.roi_align import roi_align as xla_roi_align

        _, vjp = jax.vjp(lambda f: xla_roi_align(
            f, rois, output_size, spatial_scale, sampling_ratio, aligned),
            features)
        return vjp(g)[0], None
    offset = 0.5 if aligned else 0.0
    boxes = rois[:, 1:] * spatial_scale - offset
    batch_idx = rois[:, 0].astype(jnp.int32)
    oy = jnp.clip(jnp.floor(boxes[:, 1]), 0, h - WINDOW_Y).astype(jnp.int32)
    ox = jnp.clip((jnp.floor(boxes[:, 0]) // 8) * 8, 0,
                  w - WINDOW_X).astype(jnp.int32)
    grad = _pallas_bwd_call(g, boxes, oy, ox, batch_idx,
                            (b, h, w, c), tuple(output_size),
                            sampling_ratio)
    return grad.astype(features.dtype), None


roi_align_pallas_grad.defvjp(_rapg_fwd, _rapg_bwd)


# --------------------------------------------------------------------------
# Multi-level kernel: the training extractor's real shape. Instead of the
# per-level dense compute + one-hot select (4x wasted work) or the XLA
# flat-gather (tap-at-a-time HBM reads — 36 ms for 2048 RoIs at LVIS
# scale), each grid step DMAs its RoI's window from THE assigned FPN
# level's buffer (pl.when-routed on the prefetched level index) and runs
# the same two one-hot MXU matmuls. Backward mirrors it with four aliased
# grad accumulators. Features may be bf16 (scratch matches; accumulate
# f32 on the MXU).
# --------------------------------------------------------------------------

# The ML kernel's own DMA window: mmdet's map_roi_levels puts scale/stride
# in [14, 28) per band (level 3 unbounded but capped by its map, <=25x42 at
# the 800x1344 canvas), so aspect<=4 boxes span up to 56 cells. 56x64
# (minus <=7 cells lost to 8-aligning the x origin) covers the whole
# band + all of level 3; only aspect >~4.3 outliers miss.
ML_WY = 56
ML_WX = 64


def _tap_weights(boxes_ref, i, oy, ox, out_size, samples,
                 wy=None, wx=None, fold_pool=False):
    """Per-axis bilinear tap weight matrices for RoI ``i``.

    ``fold_pool=True`` returns the SAMPLE-AVERAGED weights
    ``(out_size, wy)`` / ``(out_size, wx)`` instead of the per-tap
    ``(out_size*samples, ·)`` ones: avg-pool RoIAlign is separable, so
    ``mean_{sy,sx} row[sy] ⊗ col[sx] = (mean_sy row)(mean_sx col)`` —
    folding the pool into the weights halves both matmuls, shrinks the
    output relayout 4x, and removes the pool pass (same math, f32
    reassociation only)."""
    import jax.numpy as jnp

    wy = ML_WY if wy is None else wy
    wx = ML_WX if wx is None else wx
    n_taps = out_size * samples
    x1 = boxes_ref[i, 0] - ox.astype(jnp.float32)
    y1 = boxes_ref[i, 1] - oy.astype(jnp.float32)
    x2 = boxes_ref[i, 2] - ox.astype(jnp.float32)
    y2 = boxes_ref[i, 3] - oy.astype(jnp.float32)
    bin_h = (y2 - y1) / out_size
    bin_w = (x2 - x1) / out_size
    grid = (jax.lax.broadcasted_iota(jnp.int32, (n_taps, 1), 0)[:, 0]
            .astype(jnp.float32) + 0.5) / samples
    ys = jnp.clip(y1 + bin_h * grid, 0.0, wy - 1.0)
    xs = jnp.clip(x1 + bin_w * grid, 0.0, wx - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, wy - 1)
    x1i = jnp.minimum(x0 + 1, wx - 1)
    ly = (ys - y0.astype(jnp.float32))[:, None]
    lx = (xs - x0.astype(jnp.float32))[:, None]
    rows0 = jax.nn.one_hot(y0, wy, dtype=jnp.float32)
    rows1 = jax.nn.one_hot(y1i, wy, dtype=jnp.float32)
    cols0 = jax.nn.one_hot(x0, wx, dtype=jnp.float32)
    cols1 = jax.nn.one_hot(x1i, wx, dtype=jnp.float32)
    row_w = rows0 * (1.0 - ly) + rows1 * ly
    col_w = cols0 * (1.0 - lx) + cols1 * lx
    if fold_pool:
        row_w = row_w.reshape(out_size, samples, wy).mean(axis=1)
        col_w = col_w.reshape(out_size, samples, wx).mean(axis=1)
    return row_w, col_w


def _make_ml_kernel(out_size: int, samples: int, channels: int,
                    precision=None, n_buf: int = 2):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    precision = precision or jax.lax.Precision.HIGHEST
    n_taps = out_size * samples

    def kernel(boxes_ref, oy_ref, ox_ref, bidx_ref, lvl_ref, small_ref,
               f0, f1, f2, f3, out_ref, scratch_b, scratch_s, sem):
        # Per-RoI adaptive window: ~78% of RoIs span <= the small
        # 32x40-cell window (WINDOW_Y/X) at their assigned level; only
        # band-top / high-aspect RoIs need the full 56x64 (ML_WY/X) —
        # branching on the prefetched ``small`` flag cuts mean DMA bytes
        # ~2.4x. scratch_* have n_buf slots (double-buffered at 7x7):
        # step i starts step i+1's DMA before computing, hiding the DMA
        # latency behind the matmuls (grid steps run sequentially, so
        # slot (i+1)%2 was last read at step i-1 and is free).
        i = pl.program_id(0)
        r = pl.num_programs(0)
        oy = oy_ref[i]
        ox = ox_ref[i]
        ox = pl.multiple_of(ox, 8)
        fs = (f0, f1, f2, f3)

        def _start(j, slot):
            oxj = pl.multiple_of(ox_ref[j], 8)
            for l, f in enumerate(fs):
                @pl.when((lvl_ref[j] == l) & (small_ref[j] == 1))
                def _go_s(f=f):
                    pltpu.make_async_copy(
                        f.at[bidx_ref[j], pl.ds(oy_ref[j], WINDOW_Y),
                             pl.ds(oxj, WINDOW_X), :],
                        scratch_s.at[slot], sem.at[slot]).start()

                @pl.when((lvl_ref[j] == l) & (small_ref[j] == 0))
                def _go_b(f=f):
                    pltpu.make_async_copy(
                        f.at[bidx_ref[j], pl.ds(oy_ref[j], ML_WY),
                             pl.ds(oxj, ML_WX), :],
                        scratch_b.at[slot], sem.at[slot]).start()

        if n_buf == 2:
            @pl.when(i == 0)
            def _first():
                _start(0, 0)

            @pl.when(i + 1 < r)
            def _prefetch():
                _start(i + 1, (i + 1) % 2)

            cur = i % 2
        else:
            _start(i, 0)
            cur = 0
        # wait on the current slot: the descriptor only carries the byte
        # count, which depends on the window size branch
        @pl.when(small_ref[i] == 1)
        def _wait_s():
            pltpu.make_async_copy(
                f0.at[0, pl.ds(0, WINDOW_Y), pl.ds(0, WINDOW_X), :],
                scratch_s.at[cur], sem.at[cur]).wait()

        @pl.when(small_ref[i] == 0)
        def _wait_b():
            pltpu.make_async_copy(
                f0.at[0, pl.ds(0, ML_WY), pl.ds(0, ML_WX), :],
                scratch_b.at[cur], sem.at[cur]).wait()

        def _compute(scr, wy, wx):
            # pool folded into the weights (see _tap_weights): two
            # (out_size, ·) matmuls, output (out, C, out) -> relayout
            row_w, col_w = _tap_weights(boxes_ref, i, oy, ox, out_size,
                                        samples, wy, wx, fold_pool=True)
            feat = scr[cur].astype(jnp.float32)
            flat = feat.reshape(wy, wx * channels)
            rowsel = jnp.dot(row_w, flat,
                             preferred_element_type=jnp.float32,
                             precision=precision)
            rowsel = rowsel.reshape(out_size, wx, channels)
            vals = jax.lax.dot_general(
                rowsel, col_w,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)
            out_ref[0] = vals.transpose(0, 2, 1).astype(out_ref.dtype)

        @pl.when(small_ref[i] == 1)
        def _small():
            _compute(scratch_s, WINDOW_Y, WINDOW_X)

        @pl.when(small_ref[i] == 0)
        def _big():
            _compute(scratch_b, ML_WY, ML_WX)

    return kernel


def _make_ml_bwd_kernel(out_size: int, samples: int, channels: int):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_taps = out_size * samples

    def kernel(boxes_ref, oy_ref, ox_ref, bidx_ref, lvl_ref, small_ref,
               g_ref, gf0, gf1, gf2, gf3, o0, o1, o2, o3,
               scratch_b, scratch_s, sem_in, sem_out):
        # Same per-RoI small/full window branch as the forward: the
        # read-add-write round trip is the backward's dominant traffic,
        # and the small window carries ~2.8x fewer bytes. No double
        # buffering here — step i+1's read must observe step i's write
        # when windows overlap (RoIs overlap constantly).
        i = pl.program_id(0)
        oy = oy_ref[i]
        ox = ox_ref[i]
        b = bidx_ref[i]
        lvl = lvl_ref[i]
        ox = pl.multiple_of(ox, 8)
        outs = (o0, o1, o2, o3)

        def _accumulate(scr, wy, wx):
            # start the accumulator read, then compute dw while the DMA
            # is in flight: dw depends only on g (already in VMEM) and
            # the box scalars, not on the loaded window — the wait sits
            # right before the add
            for l, o in enumerate(outs):
                @pl.when(lvl == l)
                def _load(o=o):
                    pltpu.make_async_copy(
                        o.at[b, pl.ds(oy, wy), pl.ds(ox, wx), :],
                        scr, sem_in).start()

            # pool folded into the weights (mean over samples — see
            # _tap_weights): dF = row_w2^T g col_w2 directly, no
            # tap-repeat of g and half-size transposed matmuls
            row_w, col_w = _tap_weights(boxes_ref, i, oy, ox, out_size,
                                        samples, wy, wx, fold_pool=True)
            g = g_ref[0].astype(jnp.float32)        # (out, out, C)
            a = jax.lax.dot_general(
                row_w, g.reshape(out_size, out_size * channels),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            a = a.reshape(wy, out_size, channels)
            dw = jax.lax.dot_general(
                col_w, a,
                dimension_numbers=(((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
            dw = dw.transpose(1, 0, 2)
            # wait on the read started above (descriptor carries only
            # the byte count — same trick as the forward's wait)
            pltpu.make_async_copy(
                o0.at[0, pl.ds(0, wy), pl.ds(0, wx), :],
                scr, sem_in).wait()
            scr[:] = scr[:] + dw
            for l, o in enumerate(outs):
                @pl.when(lvl == l)
                def _store(o=o):
                    dma = pltpu.make_async_copy(
                        scr,
                        o.at[b, pl.ds(oy, wy), pl.ds(ox, wx), :],
                        sem_out)
                    dma.start()
                    dma.wait()

        @pl.when(small_ref[i] == 1)
        def _small():
            _accumulate(scratch_s, WINDOW_Y, WINDOW_X)

        @pl.when(small_ref[i] == 0)
        def _big():
            _accumulate(scratch_b, ML_WY, ML_WX)

    return kernel


def _pad_level(f):
    """Pad a level's (B, H, W, C) map up to the DMA window minima with
    EDGE replication: mmcv's bilinear snaps the high corner to the last
    row/col (y_low >= H-1 -> y_high = H-1), so taps that land in the pad
    must read the edge value, not zero."""
    b, h, w, c = f.shape
    ph, pw = max(0, ML_WY - h), max(0, ML_WX - w)
    # the kernel promises 8-aligned x origins (pl.multiple_of); the clip
    # upper bound (W - ML_WX) must itself be a multiple of 8 or
    # right-edge windows DMA from a misaligned origin
    pw += (-(w + pw - ML_WX)) % 8
    if ph or pw:
        f = jnp.pad(f, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    return f


def _small_mask(boxes):
    """True where the RoI fits the SMALL (WINDOW_Y x WINDOW_X) window at
    its level (x origin may lose up to 7 cells to 8-alignment)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    return (w <= WINDOW_X - 9) & (h <= WINDOW_Y - 1)


def _ml_prep(feats, rois, strides, finest_scale, aligned):
    """Per-roi level assignment + window origins in that level's grid.
    Origins are clipped for the window size the RoI will use (small
    RoIs take the 32x40 window — its clip bound differs from the full
    window's, or near-edge RoIs would fall outside)."""
    from iif_tpu.detection.roi_extractor import map_roi_levels

    num_levels = len(feats)
    lvl = map_roi_levels(rois, num_levels, finest_scale)
    scale = 1.0 / jnp.asarray(strides, jnp.float32)[lvl]
    offset = 0.5 if aligned else 0.0
    boxes = rois[:, 1:] * scale[:, None] - offset
    padded = [_pad_level(f) for f in feats]
    hs = jnp.asarray([f.shape[1] for f in padded], jnp.float32)[lvl]
    ws = jnp.asarray([f.shape[2] for f in padded], jnp.float32)[lvl]
    small = _small_mask(boxes)
    wy = jnp.where(small, WINDOW_Y, ML_WY).astype(jnp.float32)
    wx = jnp.where(small, WINDOW_X, ML_WX).astype(jnp.float32)
    oy = jnp.clip(jnp.floor(boxes[:, 1]), 0, hs - wy).astype(jnp.int32)
    ox = jnp.clip((jnp.floor(boxes[:, 0]) // 8) * 8, 0,
                  ws - wx).astype(jnp.int32)
    bidx = rois[:, 0].astype(jnp.int32)
    return (padded, boxes, oy, ox, bidx, lvl.astype(jnp.int32),
            small.astype(jnp.int32))


def ml_supported(feats) -> bool:
    """Whether the multi-level kernel path applies (TPU + lane-aligned C)."""
    return (jax.default_backend() in ("tpu", "axon")
            and len(feats) == 4 and feats[0].shape[-1] % 128 == 0)


# SMEM holds the scalar-prefetch operands for the whole grid; at R=2048
# the 5 operands overflow the 1 MB budget, so calls are chunked and the
# backward chains its grad accumulators through the chunks (aliased, so
# still one allocation)
ML_CHUNK = 512
# RoIs whose level-grid extent exceeds the DMA window (extreme aspect
# ratios: max_side/sqrt(area) > ~2.3, i.e. aspect beyond ~5:1 — skis,
# trains) are recomputed exactly on the XLA gather path; a fixed slot
# budget keeps shapes static (beyond it the clamped kernel value stays —
# pathological batches only)
MISFIT_CAP = 128


def _pad_r(x, r_pad):
    return jnp.pad(x, ((0, r_pad - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _fit_mask(boxes):
    """True where the RoI's window (in its level's cells) fits the DMA
    window: x origin may lose up to 7 cells to 8-alignment."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    return (w <= ML_WX - 9) & (h <= ML_WY - 1)


def _flat_fallback(feats, rois, output_size, strides, sampling_ratio,
                   finest_scale):
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor

    ex = SingleRoIExtractor(output_size, strides, sampling_ratio,
                            finest_scale)
    return ex._flat_gather(list(feats), rois).astype(jnp.float32)


def _ml_kernel_all(padded, boxes, oy, ox, bidx, lvl, small, output_size,
                   sampling_ratio, precision="highest"):
    r = boxes.shape[0]
    r_pad = -(-r // ML_CHUNK) * ML_CHUNK
    if r_pad != r:
        boxes, oy, ox, bidx, lvl, small = (_pad_r(a, r_pad) for a in
                                           (boxes, oy, ox, bidx, lvl,
                                            small))
    outs = [
        _pallas_ml_call(tuple(padded), boxes[i:i + ML_CHUNK],
                        oy[i:i + ML_CHUNK], ox[i:i + ML_CHUNK],
                        bidx[i:i + ML_CHUNK], lvl[i:i + ML_CHUNK],
                        small[i:i + ML_CHUNK],
                        tuple(output_size), sampling_ratio, precision)
        for i in range(0, r_pad, ML_CHUNK)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs)
    return out[:r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def roi_align_pallas_ml(feats, rois, output_size=(7, 7),
                        strides=(4, 8, 16, 32), sampling_ratio=2,
                        finest_scale=56.0, precision="highest"):
    """Multi-level differentiable Pallas RoIAlign: ``feats`` is the
    4-level FPN tuple; each RoI's window is DMA'd from its assigned
    level; window-misfit RoIs (extreme aspect) take the exact XLA gather
    path. Caller must check ``ml_supported(feats)`` first."""
    feats = tuple(feats)
    padded, boxes, oy, ox, bidx, lvl, small = _ml_prep(
        feats, rois, strides, finest_scale, True)
    out = _ml_kernel_all(padded, boxes, oy, ox, bidx, lvl, small,
                         tuple(output_size), sampling_ratio, precision)
    fits = _fit_mask(boxes)
    r = rois.shape[0]
    # fill_value=r -> padded slots scatter out of bounds and are dropped
    mis_idx = jnp.nonzero(~fits, size=MISFIT_CAP, fill_value=r)[0]
    safe_idx = jnp.minimum(mis_idx, r - 1)
    flat_out = _flat_fallback(feats, rois[safe_idx], tuple(output_size),
                              strides, sampling_ratio, finest_scale)
    return out.at[mis_idx].set(flat_out, mode="drop")


@functools.partial(jax.jit, static_argnames=("output_size",
                                             "sampling_ratio", "precision"))
def _pallas_ml_call(padded, boxes, oy, ox, bidx, lvl, small, output_size,
                    sampling_ratio, precision="highest"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = padded[0].shape[-1]
    r = boxes.shape[0]
    out_h = output_size[0]
    s = sampling_ratio if sampling_ratio > 0 else 2
    # double-buffered window DMA at both sizes: pool folding shrank the
    # 14x14 variant's Mosaic temporaries (pre-folding the second slot
    # overflowed the ~16 MB scoped-VMEM budget); measured 14.8 -> 14.3
    # ms isolated fwd at R=512. IIF_ROI_ML_NBUF14=1 is the escape hatch
    # if a future shape/budget combination OOMs scoped VMEM again.
    import os

    n_buf = (2 if out_h <= 7
             else int(os.environ.get("IIF_ROI_ML_NBUF14", "2")))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,     # boxes, oy, ox, bidx, lvl, small
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec((1, out_h, out_h, c),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_buf, ML_WY, ML_WX, c), padded[0].dtype),
            pltpu.VMEM((n_buf, WINDOW_Y, WINDOW_X, c), padded[0].dtype),
            pltpu.SemaphoreType.DMA((n_buf,)),
        ],
    )
    kernel = _make_ml_kernel(
        out_h, s, c,
        precision=(jax.lax.Precision.DEFAULT if precision == "default"
                   else jax.lax.Precision.HIGHEST), n_buf=n_buf)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((r, out_h, out_h, c), jnp.float32),
        grid_spec=grid_spec,
    )(boxes, oy, ox, bidx, lvl, small, *padded)


@functools.partial(jax.jit, static_argnames=("output_size",
                                             "sampling_ratio"))
def _pallas_ml_bwd_call(g, grads_in, boxes, oy, ox, bidx, lvl, small,
                        output_size, sampling_ratio):
    """One backward chunk; ``grads_in`` are the running accumulators
    (aliased into the outputs — accumulation without extra buffers)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shapes = [tuple(gi.shape) for gi in grads_in]
    c = shapes[0][-1]
    r = boxes.shape[0]
    out_h = output_size[0]
    s = sampling_ratio if sampling_ratio > 0 else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(r,),
        in_specs=[pl.BlockSpec((1, out_h, out_h, c),
                               lambda i, *_: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        scratch_shapes=[
            pltpu.VMEM((ML_WY, ML_WX, c), jnp.float32),
            pltpu.VMEM((WINDOW_Y, WINDOW_X, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = _make_ml_bwd_kernel(out_h, s, c)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(sh, jnp.float32) for sh in shapes],
        grid_spec=grid_spec,
        # operands: 6 scalar-prefetch, g, then the 4 grad accumulators
        input_output_aliases={7: 0, 8: 1, 9: 2, 10: 3},
    )(boxes, oy, ox, bidx, lvl, small, g.astype(jnp.float32), *grads_in)


def _ml_fwd(feats, rois, output_size, strides, sampling_ratio,
            finest_scale, precision):
    out = roi_align_pallas_ml(feats, rois, output_size, strides,
                              sampling_ratio, finest_scale, precision)
    return out, (tuple(feats), rois)


def _ml_bwd(output_size, strides, sampling_ratio, finest_scale, precision,
            res, g):
    feats, rois = res
    padded, boxes, oy, ox, bidx, lvl, small = _ml_prep(
        feats, rois, strides, finest_scale, True)
    r = boxes.shape[0]
    fits = _fit_mask(boxes)
    g = g.astype(jnp.float32)
    g_fit = jnp.where(fits[:, None, None, None], g, 0.0)

    r_pad = -(-r // ML_CHUNK) * ML_CHUNK
    if r_pad != r:
        # padded rois carry zero incoming grad -> no contribution
        boxes, oy, ox, bidx, lvl, small = (_pad_r(a, r_pad) for a in
                                           (boxes, oy, ox, bidx, lvl,
                                            small))
        g_fit = _pad_r(g_fit, r_pad)
    grads = tuple(jnp.zeros(p.shape, jnp.float32) for p in padded)
    for i in range(0, r_pad, ML_CHUNK):
        grads = _pallas_ml_bwd_call(
            g_fit[i:i + ML_CHUNK], grads, boxes[i:i + ML_CHUNK],
            oy[i:i + ML_CHUNK], ox[i:i + ML_CHUNK], bidx[i:i + ML_CHUNK],
            lvl[i:i + ML_CHUNK], small[i:i + ML_CHUNK],
            tuple(output_size), sampling_ratio)
    # fold window-padding grads back onto the edge rows/cols (the pad is
    # edge-replicated, so d/d(edge) includes the pad region), then slice
    def _unpad(gp, h, w):
        if gp.shape[1] > h:
            gp = gp.at[:, h - 1].add(gp[:, h:].sum(axis=1))[:, :h]
        if gp.shape[2] > w:
            gp = gp.at[:, :, w - 1].add(gp[:, :, w:].sum(axis=2))[:, :, :w]
        return gp

    out = [_unpad(gp, f.shape[1], f.shape[2])
           for gp, f in zip(grads, feats)]

    # misfit RoIs: exact autodiff of the flat-gather path
    mis_idx = jnp.nonzero(~fits, size=MISFIT_CAP, fill_value=r)[0]
    safe_idx = jnp.minimum(mis_idx, r - 1)
    g_mis = jnp.where((mis_idx < r)[:, None, None, None],
                      g[safe_idx], 0.0)
    _, vjp = jax.vjp(
        lambda ft: _flat_fallback(ft, rois[safe_idx], tuple(output_size),
                                  strides, sampling_ratio, finest_scale),
        feats)
    flat_grads = vjp(g_mis)[0]
    out = tuple((o + fg.astype(jnp.float32)).astype(f.dtype)
                for o, fg, f in zip(out, flat_grads, feats))
    return out, None


roi_align_pallas_ml.defvjp(_ml_fwd, _ml_bwd)
