"""Test-time augmentation for detection.

Rebuild of ``MultiScaleFlipAug`` (``pipelines/test_time_aug.py:11``) +
``core/post_processing/merge_augs.py``: run inference over a grid of
(scale, flip) views, map detections back to original image coordinates,
and fuse. The reference's two-stage aug-test re-scores merged proposals
through the bbox head; here we fuse final detections with class-aware NMS
over the union — one extra NMS instead of a second head pass (same
O(views) cost, no dynamic shapes).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from iif_tpu.ops.nms import batched_nms


def flip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    out = boxes.copy()
    out[..., 0] = width - boxes[..., 2]
    out[..., 2] = width - boxes[..., 0]
    return out


def merge_aug_detections(
    per_view: List[Dict[str, np.ndarray]],
    view_meta: List[Dict],
    orig_shape: Tuple[int, int],
    iou_thr: float = 0.5,
    max_per_img: int = 100,
) -> Dict[str, np.ndarray]:
    """Fuse per-view fixed-shape detections.

    per_view: list of {boxes (K,4), scores (K,), labels (K,), valid (K,)}
      in *view* coordinates.
    view_meta: per view {scale_factor: float, flip: bool}.
    """
    h, w = orig_shape
    boxes_all, scores_all, labels_all = [], [], []
    for out, meta in zip(per_view, view_meta):
        boxes = np.asarray(out["boxes"], np.float64)
        if meta.get("flip"):
            boxes = flip_boxes(boxes, w * meta["scale_factor"])
        boxes = boxes / meta["scale_factor"]
        valid = np.asarray(out["valid"], bool)
        boxes_all.append(boxes[valid])
        scores_all.append(np.asarray(out["scores"])[valid])
        labels_all.append(np.asarray(out["labels"])[valid])
    if not boxes_all or sum(len(b) for b in boxes_all) == 0:
        return {"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                "labels": np.zeros(0, np.int64)}
    boxes = np.concatenate(boxes_all).astype(np.float32)
    scores = np.concatenate(scores_all).astype(np.float32)
    labels = np.concatenate(labels_all).astype(np.int64)

    keep, order = jax.jit(batched_nms, static_argnames=())(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        iou_thr)
    keep = np.asarray(keep)
    order = np.asarray(order)
    sel = order[keep][:max_per_img]
    return {"boxes": boxes[sel], "scores": scores[sel],
            "labels": labels[sel]}


def multi_scale_flip_views(scales: Sequence[Tuple[int, int]],
                           flip: bool = True) -> List[Dict]:
    """The view grid of MultiScaleFlipAug: each scale x {orig, flipped}."""
    views = []
    for s in scales:
        views.append({"scale": tuple(s), "flip": False})
        if flip:
            views.append({"scale": tuple(s), "flip": True})
    return views
