"""MaxIoU assignment, fully vectorized and static-shape.

Rebuild of ``mmdet/core/bbox/assigners/max_iou_assigner.py:11-213``:
- each box gets the gt with max IoU if >= pos_iou_thr;
- IoU < neg_iou_thr -> background (0); in between -> ignore (-1);
- low-quality matching: every (valid) gt claims its argmax box if that IoU
  >= min_pos_iou (``gt_max_assign_all`` ties included).

The dynamic per-image python loop of the reference
(``standard_roi_head.py:84-98``) becomes a vmap over the batch with padded
gt arrays (``gt_valid`` mask) — no recompilation, no host sync.

Returns assigned_gt_inds with mmdet's convention: -1 ignore, 0 negative,
i+1 = matched to gt i.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from iif_tpu.ops.boxes import bbox_overlaps


def max_iou_assign(
    boxes: jnp.ndarray,        # (N, 4) candidates (anchors / proposals)
    gt_boxes: jnp.ndarray,     # (G, 4) padded
    gt_valid: jnp.ndarray,     # (G,) bool
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.5,
    min_pos_iou: float = 0.0,
    match_low_quality: bool = True,
    gt_max_assign_all: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (assigned_gt_inds (N,), max_overlaps (N,))."""
    # invalid (padded) gts contribute IoU 0, NOT -1: with zero valid gts
    # every box must still become a negative (max_overlaps==0 < neg_thr),
    # matching mmdet's num_gt==0 branch — otherwise empty-gt images would
    # be all-ignore and contribute nothing to RPN objectness training.
    iou = bbox_overlaps(boxes, gt_boxes)  # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, 0.0)

    max_overlaps = iou.max(axis=1)
    argmax_overlaps = iou.argmax(axis=1)

    assigned = jnp.full(boxes.shape[0], -1, jnp.int32)
    # negatives
    assigned = jnp.where((max_overlaps >= 0) & (max_overlaps < neg_iou_thr),
                         0, assigned)
    # positives
    assigned = jnp.where(max_overlaps >= pos_iou_thr,
                         argmax_overlaps.astype(jnp.int32) + 1, assigned)

    if match_low_quality:
        gt_max = iou.max(axis=0)          # (G,)
        gt_argmax = iou.argmax(axis=0)    # (G,)
        if gt_max_assign_all:
            # all boxes tying the per-gt max claim that gt (later gts win
            # ties across gts, matching the reference's sequential loop)
            claim = (iou == gt_max[None, :]) & (gt_max[None, :] >= min_pos_iou) \
                & gt_valid[None, :]
            # take the LAST claiming gt per box (reference iterates i in
            # order, overwriting)
            g_idx = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)
            last_claim = jnp.where(claim, g_idx[None, :] + 1, 0).max(axis=1)
            assigned = jnp.where(last_claim > 0, last_claim, assigned)
        else:
            # each gt claims only its single argmax box (SSD convention,
            # gt_max_assign_all=False). The reference loops i in order and
            # overwrites, so when two gts share an argmax box the LAST
            # (highest-index) gt wins -> scatter-max of (i+1).
            ok = (gt_max >= min_pos_iou) & gt_valid
            g_plus1 = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32) + 1
            claim = jnp.zeros(boxes.shape[0], jnp.int32).at[gt_argmax].max(
                jnp.where(ok, g_plus1, 0))
            assigned = jnp.where(claim > 0, claim, assigned)
    return assigned, max_overlaps
