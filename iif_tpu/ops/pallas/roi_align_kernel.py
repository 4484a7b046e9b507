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
    if (out_h != out_w or jax.default_backend() != "tpu"
            or h < WINDOW_Y or w < WINDOW_X):
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
