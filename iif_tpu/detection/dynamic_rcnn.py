"""Dynamic R-CNN: training-statistics-adaptive RoI head.

TPU-native rebuild of ``mmdet/models/roi_heads/dynamic_roi_head.py``
(Dynamic R-CNN, ECCV 2020): the assigner's IoU threshold tracks the
``iou_topk``-th best proposal IoU, and the SmoothL1 beta tracks the
``beta_topk``-th smallest regression error, both refreshed every
``update_iter_interval`` iterations.

The reference keeps python-list histories updated with per-step
``.item()`` syncs and mutates the assigner/loss objects in place; here
the histories are fixed-size device ring buffers inside
:class:`DynamicRCNNState` (a train-state leaf), the update is a
``jnp.where`` on ``count % interval == 0``, and the adaptive threshold /
beta flow into the assigner and loss as traced scalars — the whole
mechanism stays inside one jitted step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from iif_tpu.ops.boxes import bbox_overlaps

EPS = 1e-15


class DynamicRCNNState(NamedTuple):
    iou_hist: jnp.ndarray     # (interval,) ring buffer
    beta_hist: jnp.ndarray    # (interval,)
    count: jnp.ndarray        # scalar int32: steps since last refresh
    iou_thr: jnp.ndarray      # scalar f32: current assigner threshold
    beta: jnp.ndarray         # scalar f32: current SmoothL1 beta


def dynamic_rcnn_init(initial_iou: float = 0.4,
                      initial_beta: float = 1.0,
                      interval: int = 100) -> DynamicRCNNState:
    """Reference defaults from
    ``configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x.py`` ``train_cfg.rcnn
    .dynamic_rcnn`` (iou_topk=75, beta_topk=10, interval=100,
    initial_iou=0.4, initial_beta=1.0)."""
    # two distinct buffers: the train step donates its state, and XLA
    # rejects donating one buffer through two argument slots
    return DynamicRCNNState(jnp.zeros((interval,), jnp.float32),
                            jnp.zeros((interval,), jnp.float32),
                            jnp.zeros((), jnp.int32),
                            jnp.asarray(initial_iou, jnp.float32),
                            jnp.asarray(initial_beta, jnp.float32))


def dynamic_rcnn_iou_stat(proposals: jnp.ndarray,     # (B, P, 4)
                          prop_valid: jnp.ndarray,    # (B, P)
                          gt_boxes: jnp.ndarray,      # (B, G, 4)
                          gt_valid: jnp.ndarray,      # (B, G)
                          iou_topk: int = 75) -> jnp.ndarray:
    """Mean over images of the ``iou_topk``-th largest proposal-gt IoU
    (``dynamic_roi_head.py:76-86``). Padded proposals/gts contribute 0."""
    def _one(props, pv, gtb, gtv):
        iou = bbox_overlaps(props, gtb)
        iou = jnp.where(gtv[None, :], iou, 0.0)
        mo = jnp.where(pv, iou.max(axis=1), 0.0)
        k = min(iou_topk, mo.shape[0])
        top = jnp.sort(mo)[::-1][:k]
        return top[-1]

    import jax

    return jax.vmap(_one)(proposals, prop_valid, gt_boxes, gt_valid).mean()


def dynamic_rcnn_beta_stat(bbox_targets: jnp.ndarray,   # (N, 4) deltas
                           pos_mask: jnp.ndarray,       # (N,)
                           beta_topk_total: int) -> jnp.ndarray:
    """The ``beta_topk*num_imgs``-th smallest mean |dx,dy| among
    positives (``dynamic_roi_head.py:119-127``); 0 if no positives
    (the update then keeps the old beta via the median<EPS guard)."""
    err = jnp.abs(bbox_targets[:, :2]).mean(axis=1)
    err = jnp.where(pos_mask, err, jnp.inf)
    num_pos = pos_mask.astype(jnp.int32).sum()
    k = jnp.clip(jnp.minimum(beta_topk_total, num_pos), 1,
                 err.shape[0])
    kth = jnp.sort(err)[k - 1]
    return jnp.where(num_pos > 0, kth, 0.0)


def dynamic_rcnn_update(state: DynamicRCNNState,
                        cur_iou: jnp.ndarray,
                        cur_beta: jnp.ndarray,
                        initial_iou: float = 0.4,
                        initial_beta: float = 1.0) -> DynamicRCNNState:
    """Record this step's stats; every ``interval`` steps refresh
    ``iou_thr = max(initial_iou, mean(hist))`` and
    ``beta = min(initial_beta, median(hist))`` (kept when the median
    under-flows), matching ``update_hyperparameters``
    (``dynamic_roi_head.py:136-160``)."""
    interval = state.iou_hist.shape[0]
    pos = state.count % interval
    iou_hist = state.iou_hist.at[pos].set(cur_iou)
    beta_hist = state.beta_hist.at[pos].set(cur_beta)
    refresh = (state.count + 1) % interval == 0

    new_iou = jnp.maximum(initial_iou, iou_hist.mean())
    med = jnp.median(beta_hist)
    new_beta = jnp.where(med < EPS, state.beta,
                         jnp.minimum(initial_beta, med))
    return DynamicRCNNState(
        iou_hist=iou_hist, beta_hist=beta_hist,
        count=state.count + 1,
        iou_thr=jnp.where(refresh, new_iou, state.iou_thr),
        beta=jnp.where(refresh, new_beta, state.beta))
