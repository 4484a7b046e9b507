"""FreeAnchor: learning-to-match anchor assignment (NeurIPS 2019).

TPU-native rebuild of the reference's ``FreeAnchorRetinaHead``
(``mmdet/models/dense_heads/free_anchor_retina_head.py:13-270``): the
architecture is stock RetinaNet; only the loss changes — a
maximum-likelihood bag loss over the top-k anchors of each gt
("positive bag") plus a focal-style loss pushing every anchor's
P(a in A+)-weighted score to background ("negative bag").

The reference loops images in python and builds per-image sparse COO
tensors for the class-wise anchor->object probability; here each image
is one vmap lane and the sparse max becomes a dense scatter-max
(``.at[labels].max``) over a (C, A) table — static shapes, padded gts
masked by validity.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iif_tpu.detection.losses import smooth_l1_loss
from iif_tpu.detection.single_stage import (
    RetinaNet,
    SSTrainCfg,
    _flatten_cls_reg,
    make_retina_anchor_generator,
    ss_fpn_shapes,
)
from iif_tpu.ops.boxes import bbox2delta, bbox_overlaps, delta2bbox

EPS = 1e-12


class FreeAnchor(RetinaNet):
    """RetinaNet body + FreeAnchor bag losses
    (reference ``configs/free_anchor/retinanet_free_anchor_r50_fpn``)."""

    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    fa_gamma: float = 2.0
    fa_alpha: float = 0.5
    smooth_l1_beta: float = 0.11    # loss_bbox SmoothL1(beta=0.11,
    reg_weight: float = 0.75        #                    loss_weight=0.75)


def positive_bag_loss(matched_cls_prob: jnp.ndarray,
                      matched_box_prob: jnp.ndarray,
                      alpha: float) -> jnp.ndarray:
    """-alpha * log(Mean-max(P_cls * P_loc)) per gt
    (``free_anchor_retina_head.py:221-246``). (G, K) -> (G,)."""
    matched_prob = matched_cls_prob * matched_box_prob
    weight = 1.0 / jnp.clip(1.0 - matched_prob, EPS, None)
    weight = weight / weight.sum(axis=1, keepdims=True)
    bag_prob = (weight * matched_prob).sum(axis=1)
    return alpha * -jnp.log(jnp.clip(bag_prob, EPS, 1.0))


def negative_bag_loss(cls_prob: jnp.ndarray, box_prob: jnp.ndarray,
                      gamma: float, alpha: float) -> jnp.ndarray:
    """(1-alpha) * FL(P_cls * (1 - P(a in A+)))
    (``free_anchor_retina_head.py:248-270``)."""
    prob = cls_prob * (1.0 - box_prob)
    prob = jnp.clip(prob, EPS, 1.0 - EPS)
    return (1.0 - alpha) * prob ** gamma * -jnp.log(1.0 - prob)


def free_anchor_image_loss(
    anchors: jnp.ndarray,        # (A, 4)
    cls_prob: jnp.ndarray,       # (A, C) sigmoid scores
    deltas: jnp.ndarray,         # (A, 4) predicted offsets
    gt_boxes: jnp.ndarray,       # (G, 4)
    gt_labels: jnp.ndarray,      # (G,)
    gt_valid: jnp.ndarray,       # (G,)
    num_classes: int,
    pre_anchor_topk: int,
    bbox_thr: float,
    smooth_l1_beta: float,
    reg_weight: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image's (per-gt positive-bag losses (G,), image_box_prob
    (A, C)) — the body of the reference's per-image loop
    (``free_anchor_retina_head.py:100-200``)."""
    g = gt_boxes.shape[0]
    gtv = gt_valid.astype(jnp.float32)
    labels = jnp.clip(gt_labels, 0, num_classes - 1)

    # P{a_j -> b_i}: saturated-linear IoU of decoded predictions
    pred_boxes = jax.lax.stop_gradient(delta2bbox(anchors, deltas))
    obj_iou = bbox_overlaps(gt_boxes, pred_boxes)            # (G, A)
    t1 = bbox_thr
    t2 = jnp.clip(obj_iou.max(axis=1, keepdims=True), t1 + 1e-12, None)
    obj_box_prob = jnp.clip((obj_iou - t1) / (t2 - t1), 0.0, 1.0) \
        * gtv[:, None]

    # image_box_prob[a, c] = max over gts of class c (the reference's
    # sparse-COO max over objects, :128-165)
    image_box_prob = jnp.zeros((num_classes, anchors.shape[0]),
                               jnp.float32).at[labels].max(obj_box_prob).T

    # bags: top-k anchors per gt by anchor IoU
    match_q = bbox_overlaps(gt_boxes, anchors)               # (G, A)
    _, matched = jax.lax.top_k(match_q, pre_anchor_topk)     # (G, K)

    matched_cls_prob = cls_prob[matched, labels[:, None]]    # (G, K)
    matched_anchors = anchors[matched]                       # (G, K, 4)
    matched_targets = bbox2delta(
        matched_anchors.reshape(-1, 4),
        jnp.broadcast_to(gt_boxes[:, None], matched_anchors.shape)
        .reshape(-1, 4)).reshape(g, pre_anchor_topk, 4)
    loss_bbox = reg_weight * smooth_l1_loss(
        deltas[matched], matched_targets, beta=smooth_l1_beta).sum(-1)
    matched_box_prob = jnp.exp(-loss_bbox)                   # (G, K)

    pos = positive_bag_loss(matched_cls_prob, matched_box_prob,
                            alpha=1.0)      # alpha applied by the caller
    return pos * gtv, image_box_prob


def free_anchor_loss(
    model: FreeAnchor,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=FreeAnchor.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=FreeAnchor.forward_head)

    gen = make_retina_anchor_generator()
    anchors = jnp.asarray(np.concatenate(
        gen.grid_anchors(ss_fpn_shapes((img_h, img_w))), axis=0))
    scores, deltas = _flatten_cls_reg(cls_scores, bbox_preds,
                                      model.num_classes)
    cls_prob = jax.nn.sigmoid(scores.astype(jnp.float32))

    pos_losses, box_prob = jax.vmap(
        lambda cp, d, gb, gl, gv: free_anchor_image_loss(
            anchors, cp, d, gb, gl, gv, model.num_classes,
            model.pre_anchor_topk, model.bbox_thr,
            model.smooth_l1_beta, model.reg_weight))(
        cls_prob, deltas, batch["gt_boxes"], batch["gt_labels"],
        batch["gt_valid"])

    num_pos = batch["gt_valid"].astype(jnp.float32).sum()
    positive_loss = model.fa_alpha * pos_losses.sum() \
        / jnp.maximum(num_pos, 1.0)
    negative_loss = negative_bag_loss(
        cls_prob, box_prob, model.fa_gamma, model.fa_alpha).sum() \
        / jnp.maximum(num_pos * model.pre_anchor_topk, 1.0)

    losses = {"positive_bag_loss": positive_loss,
              "negative_bag_loss": negative_loss}
    total = positive_loss + negative_loss
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}
