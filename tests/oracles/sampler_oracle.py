"""Numpy oracles for the non-random proposal samplers.

Lifted from the reference's semantics (NOT its code paths):
``mmdet/core/bbox/samplers/ohem_sampler.py``,
``score_hlr_sampler.py`` (+ mmcv ``nms_match``),
``iou_balanced_neg_sampler.py``, ``instance_balanced_pos_sampler.py`` —
each re-expressed as a minimal numpy procedure that computes the same
deterministic quantities (hard-mining top-k, NMS-Match groups, score-HLR
importance/weights, per-bin quotas) so the JAX implementations can be
differentially tested where the reference is deterministic.
"""
import numpy as np


def iou_matrix(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def nms_match_groups(dets, iou_thr):
    """mmcv ``nms_match``: greedy grouping. dets (N, 5) [x1 y1 x2 y2 s].
    Returns list of index-arrays; first element of each is the leader
    (groups ordered/sorted by descending leader score)."""
    scores = dets[:, 4]
    order = np.argsort(-scores, kind="stable")
    boxes = dets[:, :4]
    iou = iou_matrix(boxes, boxes)
    matched = np.zeros(len(dets), bool)
    groups = []
    for i in order:
        if matched[i]:
            continue
        members = [i]
        matched[i] = True
        for j in order:
            if matched[j]:
                continue
            if iou[i, j] > iou_thr:
                members.append(j)
                matched[j] = True
        groups.append(np.asarray(members))
    return groups


def ohem_topk(losses, mask, k):
    """Hard mining: indices of the k largest losses among mask
    (``ohem_sampler.py:31-50``)."""
    idx = np.where(mask)[0]
    if len(idx) <= k:
        return set(idx.tolist())
    order = idx[np.argsort(-losses[idx], kind="stable")]
    return set(order[:k].tolist())


def score_hlr_oracle(max_score, decoded, neg_mask, neg_loss, num_expected,
                     score_thr=0.05, iou_thr=0.5, bias=0.0, k=0.5):
    """Deterministic part of ScoreHLRSampler._sample_neg
    (``score_hlr_sampler.py:102-214``) for the num_valid >= num_expected
    case: returns (selected original indices in hlr order, weights)."""
    neg_idx = np.where(neg_mask)[0]
    ms = max_score[neg_idx]
    valid_local = np.where(ms > score_thr)[0]
    num_valid = len(valid_local)
    assert num_valid >= num_expected, "oracle covers the no-random case"

    v_idx = neg_idx[valid_local]
    v_score = max_score[v_idx]
    dets = np.concatenate([decoded[v_idx], v_score[:, None]], axis=1)
    groups = nms_match_groups(dets, iou_thr)

    imp = np.zeros(num_valid)
    for g in groups:
        g_scores = v_score[g]
        order = np.argsort(-g_scores, kind="stable")
        rank = np.empty(len(g))
        rank[order] = np.arange(len(g))
        imp[g] = num_valid - rank + g_scores
    imp_rank_inds = np.argsort(-imp, kind="stable")
    imp_rank = np.empty(num_valid)
    imp_rank[imp_rank_inds] = np.arange(num_valid)
    hlr_local = imp_rank_inds[:num_expected]

    up = max(num_expected, num_valid)
    w = (up - imp_rank[hlr_local]) / up
    w = (bias + (1 - bias) * w) ** k
    ori = neg_loss[v_idx[hlr_local]]
    ratio = ori.sum() / max((ori * w).sum(), 1e-12)
    return v_idx[hlr_local], w * ratio
