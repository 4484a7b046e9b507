"""RPN head: per-level objectness + box-delta convs, anchor-target loss,
and static-shape proposal generation.

Rebuild of ``mmdet/models/dense_heads/rpn_head.py`` (+ the AnchorHead
train path ``anchor_head.py``): a 3x3 conv trunk then 1x1 objectness and
4A-delta convs on every FPN level; training assigns anchors with MaxIoU
(pos 0.7 / neg 0.3, low-quality 0.3) and samples 256 anchors at
pos_fraction 0.5; proposals take per-level top-``nms_pre`` candidates,
decode, then level-aware NMS and global top-``max_per_img``
(``rpn_head.py:80-244``).

TPU-first deltas: the per-image python loops become ``vmap`` over padded
(B, A_total) tensors; NMS output is a fixed ``max_per_img`` slate with a
validity mask; all anchors enter as closed-over constants.
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import nms
from iif_tpu.ops.sampler import random_sample_pos_neg

normal_init = nn.initializers.normal(stddev=0.01)


class RPNHead(nn.Module):
    feat_channels: int = 256
    num_anchors: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        conv = nn.Conv(self.feat_channels, (3, 3), padding=1,
                       kernel_init=normal_init, dtype=self.dtype,
                       name="rpn_conv")
        cls_conv = nn.Conv(self.num_anchors, (1, 1), kernel_init=normal_init,
                           name="rpn_cls")
        reg_conv = nn.Conv(self.num_anchors * 4, (1, 1),
                           kernel_init=normal_init, name="rpn_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            t = nn.relu(conv(x))
            cls_scores.append(cls_conv(t))
            bbox_preds.append(reg_conv(t))
        return cls_scores, bbox_preds


def _flatten_levels(cls_scores, bbox_preds):
    """[(B,H,W,A)], [(B,H,W,A*4)] -> (B, A_tot), (B, A_tot, 4)."""
    b = cls_scores[0].shape[0]
    scores = jnp.concatenate(
        [s.reshape(b, -1) for s in cls_scores], axis=1)
    deltas = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1)
    return scores, deltas


def rpn_loss(
    cls_scores: Sequence[jnp.ndarray],
    bbox_preds: Sequence[jnp.ndarray],
    anchors: jnp.ndarray,        # (A_tot, 4) concat over levels
    valid_mask: jnp.ndarray,     # (A_tot,) anchors inside image
    gt_boxes: jnp.ndarray,       # (B, G, 4) padded
    gt_valid: jnp.ndarray,       # (B, G)
    key: jax.Array,
    num_samples: int = 256,
    pos_fraction: float = 0.5,
    pos_iou_thr: float = 0.7,
    neg_iou_thr: float = 0.3,
    min_pos_iou: float = 0.3,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (loss_cls, loss_bbox) — BCE objectness + L1 on positives,
    both normalized by the number of sampled anchors (mmdet convention)."""
    scores, deltas = _flatten_levels(cls_scores, bbox_preds)
    b = scores.shape[0]
    keys = jax.random.split(key, b)

    def _one(score, delta, gtb, gtv, k):
        assigned, _ = max_iou_assign(
            anchors, gtb, gtv, pos_iou_thr, neg_iou_thr, min_pos_iou)
        # anchors outside the image are ignored
        assigned = jnp.where(valid_mask, assigned, -1)
        inds, is_pos, sample_valid = random_sample_pos_neg(
            k, assigned, num=num_samples, pos_fraction=pos_fraction)
        labels = is_pos.astype(jnp.float32)
        w = sample_valid.astype(jnp.float32)
        s = score[inds]
        # BCE with logits
        cls = (jnp.maximum(s, 0) - s * labels
               + jnp.log1p(jnp.exp(-jnp.abs(s))))
        loss_cls = (cls * w).sum()

        gt_idx = jnp.clip(assigned[inds] - 1, 0, gtb.shape[0] - 1)
        tgt = bbox2delta(anchors[inds], gtb[gt_idx], target_means, target_stds)
        l1 = jnp.abs(delta[inds] - tgt).sum(-1)
        loss_bbox = (l1 * labels * w).sum()
        return loss_cls, loss_bbox, w.sum()

    lc, lb, n = jax.vmap(_one)(scores, deltas, gt_boxes, gt_valid, keys)
    denom = jnp.maximum(n.sum(), 1.0)
    return lc.sum() / denom, lb.sum() / denom


def rpn_proposals(
    cls_scores: Sequence[jnp.ndarray],
    bbox_preds: Sequence[jnp.ndarray],
    anchors_per_level: Sequence[jnp.ndarray],
    img_shape: Tuple[int, int],
    nms_pre: int = 1000,
    max_per_img: int = 1000,
    nms_iou: float = 0.7,
    min_bbox_size: float = 0.0,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (proposals (B, P, 4), scores (B, P), valid (B, P)),
    P = max_per_img. Fixed shapes throughout.

    NMS runs PER LEVEL (mmdet's ``batched_nms`` with level ids never
    crosses levels, so per-level sweeps are exactly equivalent while the
    pairwise-IoU work drops from (sum k_l)^2 to sum k_l^2 — 5x at the
    LVIS recipe's 5 x 2000 candidates). The per-level candidate top-k
    uses the TPU-native ``approx_max_k`` on the big low levels (level 0
    alone is 200k anchors at 800x1344; a full sort there dominates the
    whole RPN)."""
    b = cls_scores[0].shape[0]
    out_boxes, out_scores = [], []
    for lvl, (s, d, anc) in enumerate(zip(cls_scores, bbox_preds,
                                          anchors_per_level)):
        s = jax.nn.sigmoid(s.reshape(b, -1).astype(jnp.float32))
        d = d.reshape(b, -1, 4)
        k = min(nms_pre, s.shape[1])
        if s.shape[1] >= 8192:
            top_s, top_i = jax.lax.approx_max_k(s, k, recall_target=0.95)
        else:
            top_s, top_i = jax.lax.top_k(s, k)
        anc_b = jnp.broadcast_to(anc[None], (b,) + anc.shape)
        sel_anc = jnp.take_along_axis(anc_b, top_i[..., None], axis=1)
        sel_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        boxes = delta2bbox(sel_anc, sel_d, target_means, target_stds,
                           max_shape=img_shape)
        if min_bbox_size >= 0:
            w = boxes[..., 2] - boxes[..., 0]
            h = boxes[..., 3] - boxes[..., 1]
            ok = (w > min_bbox_size) & (h > min_bbox_size)
            top_s = jnp.where(ok, top_s, -jnp.inf)

        def _one_level(bx, sc):
            keep, order = nms(bx, sc, nms_iou)
            return bx[order], jnp.where(keep, sc[order], -jnp.inf)

        bx_l, sc_l = jax.vmap(_one_level)(boxes, top_s)
        out_boxes.append(bx_l)
        out_scores.append(sc_l)

    boxes = jnp.concatenate(out_boxes, axis=1)     # (B, sum k_l, 4)
    scores = jnp.concatenate(out_scores, axis=1)   # survivors only finite

    k_out = min(max_per_img, scores.shape[1])

    def _one(bx, sc):
        top_s, top_i = jax.lax.top_k(sc, k_out)
        valid = jnp.isfinite(top_s)
        return jnp.where(valid[:, None], bx[top_i], 0.0), \
            jnp.where(valid, top_s, 0.0), valid

    out_b, out_s, out_v = jax.vmap(_one)(boxes, scores)
    if k_out < max_per_img:       # pad small images to the fixed slate
        pad = max_per_img - k_out
        out_b = jnp.concatenate(
            [out_b, jnp.zeros((out_b.shape[0], pad, 4), out_b.dtype)], 1)
        out_s = jnp.concatenate(
            [out_s, jnp.zeros((out_s.shape[0], pad), out_s.dtype)], 1)
        out_v = jnp.concatenate(
            [out_v, jnp.zeros((out_v.shape[0], pad), bool)], 1)
    return out_b, out_s, out_v
