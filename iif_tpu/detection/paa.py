"""PAA detector (Probabilistic Anchor Assignment), static-shape.

Rebuild of the reference PAA family
(``mmdet/models/detectors/paa.py``, head
``mmdet/models/dense_heads/paa_head.py``, config
``configs/paa/paa_r50_fpn_1x_coco.py``): an ATSS-architecture head
whose positive/negative split is fit per-gt by a TWO-COMPONENT GAUSSIAN
MIXTURE over candidate anchor losses — candidates are the top-9
lowest-loss anchors per pyramid level among a loose MaxIoU (0.1/0.1)
pre-assignment; the low-loss mixture component (up to its
maximum-likelihood sample, scheme (c) of the paper) becomes positive.
Final losses: focal cls / max(num_pos, B); GIoU x1.3 weighted by the
detached prediction-gt IoU / its sum; BCE IoU branch x0.5 / num_pos.
Inference adds SCORE VOTING over the pre-NMS candidate slate.

TPU-first: the sklearn ``GaussianMixture(2)`` of the reference (a HOST
call inside the train step!) becomes a fixed-iteration vmapped 1-D EM —
the whole assignment stays inside the one jitted program.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.atss import (
    ATSS,
    ATSS_DELTA_STDS,
    ATSSHead,
    make_atss_anchor_generator,
)
from iif_tpu.detection.losses import iou_loss, sigmoid_focal_loss
from iif_tpu.detection.single_stage import (
    SS_STRIDES,
    SSTestCfg,
    SSTrainCfg,
    ss_fpn_shapes,
)
from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms

EPS = 1e-6
PAA_TOPK = 9


class PAA(ATSS):
    """Same modules as ATSS (``PAAHead(ATSSHead)``); only the
    assignment and loss change."""


def gmm_em_1d(x: jnp.ndarray,       # (K,) sorted ascending
              valid: jnp.ndarray,   # (K,)
              iters: int = 25,
              reg_covar: float = 1e-6
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration EM for a 2-component 1-D diagonal GMM with the
    reference's init (means = [min, max], weights 0.5, var 1).
    Returns (component (K,) int32 by argmax responsibility,
    log-likelihood score (K,))."""
    n = jnp.maximum(valid.sum(), 1.0)
    big = 1e8
    xmin = jnp.where(valid, x, big).min()
    xmax = jnp.where(valid, x, -big).max()
    mu = jnp.stack([xmin, xmax])
    var = jnp.ones(2)
    w = jnp.full(2, 0.5)

    def step(carry, _):
        mu, var, w = carry
        logp = (-0.5 * (x[:, None] - mu[None]) ** 2 / var[None]
                - 0.5 * jnp.log(2 * jnp.pi * var[None])
                + jnp.log(w[None]))                     # (K, 2)
        logp = jnp.where(valid[:, None], logp, 0.0)
        resp = jax.nn.softmax(logp, axis=1) * valid[:, None]
        nk = jnp.maximum(resp.sum(0), EPS)
        mu2 = (resp * x[:, None]).sum(0) / nk
        var2 = (resp * (x[:, None] - mu2[None]) ** 2).sum(0) / nk \
            + reg_covar
        w2 = nk / n
        return (mu2, var2, w2), None

    (mu, var, w), _ = jax.lax.scan(step, (mu, var, w), None,
                                   length=iters)
    logp = (-0.5 * (x[:, None] - mu[None]) ** 2 / var[None]
            - 0.5 * jnp.log(2 * jnp.pi * var[None])
            + jnp.log(jnp.maximum(w[None], EPS)))
    comp = logp.argmax(1).astype(jnp.int32)
    score = jax.scipy.special.logsumexp(logp, axis=1)
    return comp, score


def paa_reassign_single_gt(pos_loss: jnp.ndarray,   # (N,)
                           is_cand: jnp.ndarray,    # (N,) assigned to g
                           level_of: jnp.ndarray,   # (N,) int
                           num_levels: int) -> jnp.ndarray:
    """``paa_head.py:258-365`` for ONE gt: per-level top-9 lowest-loss
    candidates -> 1-D GMM -> scheme (c). Returns keep (N,) bool."""
    n = pos_loss.shape[0]
    cand_idx_list, cand_loss_list = [], []
    for lvl in range(num_levels):
        m = is_cand & (level_of == lvl)
        masked = jnp.where(m, pos_loss, jnp.inf)
        v, i = jax.lax.top_k(-masked, PAA_TOPK)
        cand_loss_list.append(-v)
        cand_idx_list.append(i)
    losses = jnp.concatenate(cand_loss_list)        # (L*9,)
    idxs = jnp.concatenate(cand_idx_list)
    order = jnp.argsort(losses)
    losses = losses[order]
    idxs = idxs[order]
    cvalid = jnp.isfinite(losses)

    comp, score = gmm_em_1d(jnp.where(cvalid, losses, 0.0), cvalid)
    fg = (comp == 0) & cvalid
    # scheme (c): keep fg candidates up to the max-score fg sample
    score_m = jnp.where(fg, score, -jnp.inf)
    thr_pos = score_m.argmax()
    fg_rank = jnp.cumsum(fg) - 1
    keep_c = fg & (fg_rank <= fg_rank[thr_pos]) & fg.any()

    keep = jnp.zeros(n, bool)
    keep = keep.at[idxs].max(keep_c)
    return keep & is_cand.any()


def paa_loss(
    model: PAA,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``paa_head.py:87-200``."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=PAA.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds, iou_preds = model.apply(
        variables, feats, method=PAA.forward_head)

    gen = make_atss_anchor_generator()
    shapes = ss_fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    level_of = jnp.asarray(np.concatenate([
        np.full(fh * fw, lv, np.int32)
        for lv, (fh, fw) in enumerate(shapes)]))
    num_levels = len(shapes)
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    deltas = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1)
    ious_p = jnp.concatenate(
        [x.reshape(b, -1) for x in iou_preds], axis=1)
    g = batch["gt_boxes"].shape[1]

    def _one(score, delta, iop, gtb, gtl, gtv):
        assigned, _ = max_iou_assign(anchors, gtb, gtv, 0.1, 0.1, 0.0)
        is_pos0 = assigned > 0
        gt_idx = jnp.clip(assigned - 1, 0, g - 1)
        labels0 = jnp.where(is_pos0, gtl[gt_idx], c)

        # per-anchor candidate loss (get_pos_loss): focal at the label
        # + GIoU*1.3 on the decoded box
        decoded = delta2bbox(anchors, delta, stds=ATSS_DELTA_STDS)
        l_cls_all = sigmoid_focal_loss(score, labels0, c, cfg.gamma,
                                       cfg.alpha)
        l_box_all = 1.3 * iou_loss(decoded, gtb[gt_idx], "giou")
        pos_loss = jnp.where(is_pos0, l_cls_all + l_box_all, jnp.inf)
        pos_loss = jax.lax.stop_gradient(pos_loss)

        keep = jax.vmap(lambda gi: paa_reassign_single_gt(
            pos_loss, is_pos0 & (assigned == gi + 1) & gtv[gi],
            level_of, num_levels))(jnp.arange(g))       # (G, N)
        is_pos = keep.any(0)
        labels = jnp.where(is_pos, gtl[gt_idx], c)

        l_cls = sigmoid_focal_loss(score, labels, c, cfg.gamma,
                                   cfg.alpha).sum()
        tgt = gtb[gt_idx]
        iou_t = jnp.clip(1.0 - iou_loss(
            jax.lax.stop_gradient(decoded), tgt, "linear"), EPS) * is_pos
        l_bbox = 1.3 * (iou_loss(decoded, tgt, "giou") * iou_t).sum()
        i32 = iop.astype(jnp.float32)
        bce = (jnp.maximum(i32, 0) - i32 * iou_t
               + jnp.log1p(jnp.exp(-jnp.abs(i32))))
        l_iou = 0.5 * (bce * is_pos).sum()
        return l_cls, l_bbox, l_iou, is_pos.sum(), iou_t.sum()

    lc, lb, li, npos, iousum = jax.vmap(_one)(
        scores.astype(jnp.float32), deltas.astype(jnp.float32),
        ious_p, batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    n = jnp.maximum(npos.sum().astype(jnp.float32), float(b))
    n_pos = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    losses = {"loss_cls": lc.sum() / n,
              "loss_bbox": lb.sum() / jnp.maximum(iousum.sum(), 1.0),
              "loss_iou": li.sum() / n_pos}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def score_voting(dets: jnp.ndarray,       # (K, 4)
                 det_scores: jnp.ndarray,  # (K,)
                 det_labels: jnp.ndarray,  # (K,)
                 cand_boxes: jnp.ndarray,  # (N, 4)
                 cand_scores: jnp.ndarray,  # (N, C)
                 sigma: float = 0.025) -> jnp.ndarray:
    """``paa_head.py`` score_voting: each kept det's box becomes the
    exp(-(1-IoU)^2/0.025)-and-score weighted average of same-class
    candidates with IoU > 0.01."""
    lt = jnp.maximum(dets[:, None, :2], cand_boxes[None, :, :2])
    rb = jnp.minimum(dets[:, None, 2:], cand_boxes[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    a1 = ((dets[:, 2] - dets[:, 0])
          * (dets[:, 3] - dets[:, 1]))[:, None]
    a2 = ((cand_boxes[:, 2] - cand_boxes[:, 0])
          * (cand_boxes[:, 3] - cand_boxes[:, 1]))[None]
    ious = inter / jnp.maximum(a1 + a2 - inter, EPS)      # (K, N)
    cls_sc = cand_scores.T[det_labels]                    # (K, N)
    w = jnp.exp(-((1.0 - ious) ** 2) / sigma) * cls_sc \
        * (ious > 0.01)
    denom = jnp.maximum(w.sum(1, keepdims=True), EPS)
    return (w[..., None] * cand_boxes[None]).sum(1) / denom


def paa_simple_test(
    model: PAA,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """ATSS-style decode with sqrt(cls * iou) scores, NMS, then score
    voting (``paa_head.py`` _get_bboxes + score_voting)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False, method=PAA.extract_feat)
    cls_scores, bbox_preds, iou_preds = model.apply(
        variables, feats, method=PAA.forward_head)
    gen = make_atss_anchor_generator()
    anchors_np = gen.grid_anchors(ss_fpn_shapes((img_h, img_w)))
    c = model.num_classes

    lvl_boxes, lvl_scores = [], []
    for s, d, io, anc in zip(cls_scores, bbox_preds, iou_preds,
                             anchors_np):
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        io = jax.nn.sigmoid(io.reshape(b, -1).astype(jnp.float32))
        s = jnp.sqrt(s * io[..., None])
        d = d.reshape(b, -1, 4).astype(jnp.float32)
        anc = jnp.asarray(anc)
        k = min(cfg.nms_pre, s.shape[1])
        top_i = jax.lax.top_k(s.max(-1), k)[1]
        sel_s = jnp.take_along_axis(s, top_i[..., None], axis=1)
        sel_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        sel_a = jnp.take_along_axis(
            jnp.broadcast_to(anc[None], (b,) + anc.shape),
            top_i[..., None], axis=1)
        lvl_boxes.append(delta2bbox(sel_a, sel_d, stds=ATSS_DELTA_STDS,
                                    max_shape=(img_h, img_w)))
        lvl_scores.append(sel_s)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)

    def _one(bx, sc):
        padded = jnp.concatenate(
            [sc, jnp.zeros((sc.shape[0], 1), sc.dtype)], axis=1)
        dets, s_out, l_out, valid = multiclass_nms(
            bx, padded, cfg.score_thr, cfg.nms_iou, cfg.max_per_img)
        voted = score_voting(dets, s_out, l_out, bx, sc)
        dets = jnp.where(valid[:, None], voted, dets)
        return dets, s_out, l_out, valid

    dets, out_scores, labels, det_valid = jax.vmap(_one)(boxes, scores)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}
