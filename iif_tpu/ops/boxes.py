"""Box primitives: IoU matrix and the delta (dx,dy,dw,dh) coder.

TPU-native equivalents of the reference's
``mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:11-272`` (bbox2delta /
delta2bbox with target means/stds, wh-ratio clip and max_shape clamp) and
``mmdet/core/evaluation/bbox_overlaps.py`` / ``core/bbox/iou_calculators``.

All functions are batched, static-shape, and vmap/jit friendly. Boxes are
(x1, y1, x2, y2) in pixel coordinates.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def bbox_overlaps(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                  mode: str = "iou", eps: float = 1e-6) -> jnp.ndarray:
    """Pairwise IoU / IoF matrix, (N, M)."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    if mode == "iou":
        union = area1[:, None] + area2[None, :] - inter
    elif mode == "iof":
        union = area1[:, None] * jnp.ones_like(area2)[None, :]
    else:
        raise ValueError(mode)
    return inter / jnp.maximum(union, eps)


def bbox_overlaps_aligned(boxes1: jnp.ndarray, boxes2: jnp.ndarray,
                          eps: float = 1e-6) -> jnp.ndarray:
    """Row-aligned IoU, (N,) (mmdet ``bbox_overlaps(..., is_aligned=True)``)."""
    lt = jnp.maximum(boxes1[:, :2], boxes2[:, :2])
    rb = jnp.minimum(boxes1[:, 2:], boxes2[:, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[:, 0] * wh[:, 1]
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    return inter / jnp.maximum(area1 + area2 - inter, eps)


def bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
               means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
               stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode gt boxes as deltas wrt proposals (regression targets)."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]

    dx = (gx - px) / jnp.maximum(pw, 1e-6)
    dy = (gy - py) / jnp.maximum(ph, 1e-6)
    dw = jnp.log(jnp.maximum(gw, 1e-6) / jnp.maximum(pw, 1e-6))
    dh = jnp.log(jnp.maximum(gh, 1e-6) / jnp.maximum(ph, 1e-6))
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def legacy_bbox2delta(proposals: jnp.ndarray, gt: jnp.ndarray,
                      means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
                      stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
                      ) -> jnp.ndarray:
    """MMDet V1.x delta encoding (reference
    ``core/bbox/coder/legacy_delta_xywh_bbox_coder.py:97-136``): widths
    and heights carry the legacy ``+ 1`` pixel convention. Only needed
    when evaluating checkpoints trained with MMDetection 1.x."""
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def legacy_delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
                      means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
                      stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
                      max_shape: Optional[Tuple[int, int]] = None,
                      wh_ratio_clip: float = 16.0 / 1000.0) -> jnp.ndarray:
    """MMDet V1.x delta decoding (reference
    ``legacy_delta_xywh_bbox_coder.py:139-215``): ``+ 1`` roi wh, NO
    ``-+ 0.5`` on the corners (matching the reference's intentional
    deviation, its comment at :203-206), and ``max_shape - 1`` clamps."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    shape = deltas.shape
    deltas = deltas.reshape(shape[:-1] + (-1, 4))
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0] + 1.0)[..., None]
    ph = (rois[..., 3] - rois[..., 1] + 1.0)[..., None]

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        h, w = max_shape
        x1 = jnp.clip(x1, 0, w - 1)
        y1 = jnp.clip(y1, 0, h - 1)
        x2 = jnp.clip(x2, 0, w - 1)
        y2 = jnp.clip(y2, 0, h - 1)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    return out.reshape(shape)


def delta2bbox(rois: jnp.ndarray, deltas: jnp.ndarray,
               means: Sequence[float] = (0.0, 0.0, 0.0, 0.0),
               stds: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
               max_shape: Optional[Tuple[int, int]] = None,
               wh_ratio_clip: float = 16.0 / 1000.0) -> jnp.ndarray:
    """Decode deltas into boxes. ``deltas`` may be (..., 4) or (..., C*4)
    (per-class regression); rois broadcast accordingly."""
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    shape = deltas.shape
    deltas = deltas.reshape(shape[:-1] + (-1, 4))
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)

    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0])[..., None]
    ph = (rois[..., 3] - rois[..., 1])[..., None]

    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    gx = px + pw * dx
    gy = py + ph * dy

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        h, w = max_shape
        x1 = jnp.clip(x1, 0, w)
        y1 = jnp.clip(y1, 0, h)
        x2 = jnp.clip(x2, 0, w)
        y2 = jnp.clip(y2, 0, h)
    out = jnp.stack([x1, y1, x2, y2], axis=-1)
    return out.reshape(shape)
