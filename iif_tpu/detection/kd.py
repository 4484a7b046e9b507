"""Knowledge-distillation single-stage training (LD — Localization
Distillation), static-shape.

Rebuild of ``mmdet/models/detectors/kd_one_stage.py``
(KnowledgeDistillationSingleStageDetector), head
``mmdet/models/dense_heads/ld_head.py`` and loss
``mmdet/models/losses/kd_loss.py`` (config
``configs/ld/ld_r18_gflv1_r101_fpn_coco_1x.py``): a GFL student trains
with the standard GFL losses PLUS a temperature-10 KL divergence
between its per-side box-distribution logits and a frozen teacher's, on
ATSS positives weighted by the detached max joint score (x0.25).

The teacher is any GFL-architecture model + its frozen variables; its
forward runs inside the same jitted step under ``stop_gradient`` (the
reference runs the teacher under ``torch.no_grad`` per batch).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iif_tpu.detection.atss import atss_assign, make_atss_anchor_generator
from iif_tpu.detection.gfl import (
    GFL,
    _anchor_strides,
    bbox2distance,
    distribution_focal_loss,
    integral_distance,
    quality_focal_loss,
)
from iif_tpu.detection.losses import iou_loss
from iif_tpu.detection.single_stage import (
    SSTrainCfg,
    distance2bbox,
    ss_fpn_shapes,
)


def kd_kl_div(pred: jnp.ndarray,        # (M, n+1) student logits
              soft: jnp.ndarray,        # (M, n+1) teacher logits
              T: float = 10.0) -> jnp.ndarray:
    """``kd_loss.py:12-36``: KL(softmax(teacher/T) || softmax(pred/T))
    * T^2, mean over bins. Returns (M,)."""
    target = jax.lax.stop_gradient(jax.nn.softmax(soft / T, axis=1))
    logp = jax.nn.log_softmax(pred / T, axis=1)
    logt = jnp.log(jnp.clip(target, 1e-12))
    kl = (target * (logt - logp)).mean(1) * (T * T)
    return kl


def ld_loss(
    student: GFL,
    student_vars: Dict[str, Any],
    teacher: GFL,
    teacher_vars: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
    ld_weight: float = 0.25,
    T: float = 10.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``ld_head.py`` loss_single: the GFL losses + the LD KL on the
    positive anchors' per-side distributions."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = student.apply(
        student_vars, images, True, method=GFL.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds = student.apply(
        student_vars, feats, method=GFL.forward_head)

    t_feats = teacher.apply(teacher_vars, images, False,
                            method=GFL.extract_feat)
    t_cls, t_bbox = teacher.apply(teacher_vars, t_feats,
                                  method=GFL.forward_head)

    gen = make_atss_anchor_generator()
    shapes = ss_fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    strides = jnp.asarray(_anchor_strides(shapes))
    level_sizes = [fh * fw for fh, fw in shapes]
    c = student.num_classes
    rm = student.reg_max
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    dists = jnp.concatenate(
        [d.reshape(b, -1, 4 * (rm + 1)) for d in bbox_preds], axis=1)
    t_dists = jax.lax.stop_gradient(jnp.concatenate(
        [d.reshape(b, -1, 4 * (rm + 1)) for d in t_bbox], axis=1))
    centers = jnp.stack([(anchors[:, 0] + anchors[:, 2]) * 0.5,
                         (anchors[:, 1] + anchors[:, 3]) * 0.5], -1)

    def _one(score, dist, tdist, gtb, gtl, gtv):
        assigned = atss_assign(anchors, level_sizes, gtb, gtv)
        is_pos = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        labels = jnp.where(is_pos, gtl[gt_idx], c)
        gt_of = gtb[gt_idx]
        ctr_s = centers / strides[:, None]
        ltrb = integral_distance(dist, rm)
        decoded = distance2bbox(ctr_s, ltrb)
        tgt_s = gt_of / strides[:, None]
        q = 1.0 - iou_loss(jax.lax.stop_gradient(decoded), tgt_s,
                           "linear")
        q = jnp.where(is_pos, q, 0.0)
        w = jnp.where(
            is_pos,
            jax.lax.stop_gradient(jax.nn.sigmoid(score)).max(-1), 0.0)

        l_cls = quality_focal_loss(score, labels, q).sum()
        l_bbox = (iou_loss(decoded, tgt_s, "giou") * w).sum() * 2.0
        corners = dist.reshape(-1, rm + 1)
        tgt_corners = bbox2distance(ctr_s, tgt_s, rm).reshape(-1)
        w4 = jnp.repeat(w, 4)
        l_dfl = (distribution_focal_loss(corners, tgt_corners)
                 * w4).sum() / 4.0 * 0.25
        # Localization Distillation on the same positives
        t_corners = tdist.reshape(-1, rm + 1)
        l_ld = (kd_kl_div(corners, t_corners, T) * w4).sum() / 4.0 \
            * ld_weight
        return l_cls, l_bbox, l_dfl, l_ld, is_pos.sum(), w.sum()

    lc, lb, ldfl, lld, npos, wsum = jax.vmap(_one)(
        scores.astype(jnp.float32), dists.astype(jnp.float32), t_dists,
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    avg = jnp.maximum(wsum.sum(), 1.0)
    losses = {"loss_cls": lc.sum() / n, "loss_bbox": lb.sum() / avg,
              "loss_dfl": ldfl.sum() / avg, "loss_ld": lld.sum() / avg}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}
