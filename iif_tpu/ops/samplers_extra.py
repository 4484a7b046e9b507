"""Hard-example / balanced RoI sampler family.

TPU-native rebuilds of the reference's non-random proposal samplers
(``mmdet/core/bbox/samplers/``):

- OHEM (``ohem_sampler.py:10-110``): pick the highest-classification-loss
  candidates instead of random ones (needs a no-grad bbox-head forward
  over the candidate slate, which the caller provides).
- InstanceBalancedPosSampler (``instance_balanced_pos_sampler.py:10-77``):
  per-gt positive quota ``round(k/num_gts)+1``, random within each gt's
  group, random backfill.
- IoUBalancedNegSampler (``iou_balanced_neg_sampler.py:10-157``):
  negatives stratified into IoU bins above ``floor_thr`` with equal
  per-bin quotas, the rest from the floor set, random backfill.
- ScoreHLRSampler (``score_hlr_sampler.py:12-264``): negatives ranked by
  score hierarchical local rank (NMS-Match groups, in-group score rank,
  cross-group re-rank) and given down-weighted label weights.
- CombinedSampler (``combined_sampler.py``): any pos choice x any neg
  choice — here simply the ``pos_sampler``/``neg_sampler`` arguments.

Every reference sampler concatenates variable-length index tensors on
host; here each is "top-k by priority under a mask" on the fixed
candidate slate — random choice uses noise priorities, quota/tier rules
become additive priority offsets, so one ``top_k`` replaces the python
set algebra. All return the ``(inds, is_pos, valid)`` contract of
:func:`iif_tpu.ops.sampler.random_sample_pos_neg` (positives first).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from iif_tpu.ops.boxes import bbox_overlaps


def _topk_by_priority(priority: jnp.ndarray, mask: jnp.ndarray, k: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the k highest-priority True positions (valid flags for
    slots beyond the population)."""
    scores = jnp.where(mask, priority, -jnp.inf)
    k_eff = min(k, mask.shape[0])
    top, idx = jax.lax.top_k(scores, k_eff)
    if k_eff < k:
        top = jnp.concatenate([top, jnp.full(k - k_eff, -jnp.inf, top.dtype)])
        idx = jnp.concatenate([idx, jnp.zeros(k - k_eff, idx.dtype)])
    valid = top > -jnp.inf
    idx = jnp.where(valid, idx, jnp.argmax(mask.astype(jnp.int32)))
    return idx, valid


def _rank_in_group(priority: jnp.ndarray, same_group: jnp.ndarray
                   ) -> jnp.ndarray:
    """Descending rank of priority[i] within its group (ties -> lower
    index first)."""
    n = priority.shape[0]
    gt = priority[None, :] > priority[:, None]
    tie = (priority[None, :] == priority[:, None]) & (
        jnp.arange(n)[None, :] < jnp.arange(n)[:, None])
    return ((gt | tie) & same_group).astype(jnp.int32).sum(1)


# ------------------------------------------------------------------- OHEM
def ohem_priority(per_cand_loss: jnp.ndarray) -> jnp.ndarray:
    """OHEM's choice rule is simply 'highest loss first'
    (``ohem_sampler.py:31-50``); the loss itself comes from a no-grad
    bbox-head forward supplied by the caller."""
    return per_cand_loss


# ------------------------------------ instance-balanced positive sampling
def instance_balanced_pos_priority(
    key: jax.Array,
    assigned_gt_inds: jnp.ndarray,   # (N,) -1 ignore / 0 neg / i+1 pos
    num_expected: int,
) -> jnp.ndarray:
    """Priorities whose top-k reproduces InstanceBalancedPosSampler
    (``instance_balanced_pos_sampler.py:24-77``): each gt with positives
    gets a quota of ``round(k/num_gts)+1`` random picks; leftovers
    backfill randomly from the remaining positives."""
    pos = assigned_gt_inds > 0
    n = assigned_gt_inds.shape[0]
    noise = jax.random.uniform(key, (n,))

    # gts that own >=1 positive (dynamic count, like labels.unique())
    same_gt = (assigned_gt_inds[:, None] == assigned_gt_inds[None, :]) \
        & pos[:, None] & pos[None, :]
    is_group_head = pos & (_rank_in_group(
        -jnp.arange(n, dtype=jnp.float32), same_gt) == 0)
    num_gts = jnp.maximum(is_group_head.sum(), 1)
    num_per_gt = (jnp.round(num_expected / num_gts.astype(jnp.float32))
                  .astype(jnp.int32) + 1)

    in_quota = _rank_in_group(noise, same_gt) < num_per_gt
    return noise + 2.0 * in_quota.astype(jnp.float32)


# ------------------------------------------ IoU-balanced negative sampling
def iou_balanced_neg_priority(
    key: jax.Array,
    assigned_gt_inds: jnp.ndarray,
    max_overlaps: jnp.ndarray,       # (N,)
    num_expected: int,
    floor_thr: float = -1.0,
    floor_fraction: float = 0.0,
    num_bins: int = 3,
) -> jnp.ndarray:
    """Priorities whose top-k reproduces IoUBalancedNegSampler
    (``iou_balanced_neg_sampler.py:48-157``) as a 3-tier rule:
    tier 3 = within a per-IoU-bin quota above the floor, tier 2 = floor
    set, tier 1 = leftover backfill; random inside each tier."""
    neg = assigned_gt_inds == 0
    n = assigned_gt_inds.shape[0]
    noise = jax.random.uniform(key, (n,)) * 0.999

    if floor_thr > 0:
        floor_set = neg & (max_overlaps >= 0) & (max_overlaps < floor_thr)
        iou_set = neg & (max_overlaps >= floor_thr)
        floor0 = floor_thr
    elif floor_thr == 0:
        floor_set = neg & (max_overlaps == 0)
        iou_set = neg & (max_overlaps > 0)
        floor0 = 0.0
    else:
        floor_set = jnp.zeros_like(neg)
        iou_set = neg & (max_overlaps > floor_thr)
        floor0 = 0.0   # the reference resets floor_thr=0 for intervals

    num_expected_iou = int(num_expected * (1.0 - floor_fraction))
    per_bin = num_expected_iou // max(num_bins, 1)

    max_iou = jnp.max(jnp.where(neg, max_overlaps, 0.0))
    interval = jnp.maximum((max_iou - floor0) / num_bins, 1e-12)
    bin_idx = jnp.clip(((max_overlaps - floor0) / interval)
                       .astype(jnp.int32), 0, num_bins - 1)
    same_bin = (bin_idx[:, None] == bin_idx[None, :]) \
        & iou_set[:, None] & iou_set[None, :]
    in_bin_quota = _rank_in_group(noise, same_bin) < per_bin
    # when the iou set is smaller than its quota the reference takes all
    iou_count = iou_set.astype(jnp.int32).sum()
    take_all_iou = iou_count <= num_expected_iou

    tier = jnp.where(iou_set & (in_bin_quota | take_all_iou), 3,
                     jnp.where(floor_set, 2, 1)).astype(jnp.float32)
    return tier + noise


# ------------------------------------------------- NMS-Match (score-HLR)
def nms_match_leaders(boxes: jnp.ndarray, scores: jnp.ndarray,
                      valid: jnp.ndarray, iou_thr: float
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS-Match (mmcv ``nms_match``): returns (kept (N,) bool,
    leader (N,) int) where leader[i] is the index of the kept box whose
    group i joined (itself for kept boxes; -1 for invalid).

    Sequential greedy semantics via an O(N^2) IoU matrix + a fixpoint:
    a box is kept iff no higher-scoring kept box overlaps it > thr; the
    leader is the highest-scoring kept box overlapping it > thr.
    """
    n = boxes.shape[0]
    iou = bbox_overlaps(boxes, boxes)
    iou = jnp.where(valid[:, None] & valid[None, :], iou, 0.0)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    rank = jnp.argsort(order)                      # rank in score order
    earlier = rank[None, :] < rank[:, None]        # j strictly before i
    overlap = (iou > iou_thr) & earlier

    def step(_, kept):
        return ~(overlap & kept[None, :]).any(axis=1) & valid

    kept = jax.lax.fori_loop(0, n, step, valid)
    # leader = best-ranked kept box with IoU>thr (incl. self: iou(i,i)=1)
    cand = (iou > iou_thr) & kept[None, :]
    lead_rank = jnp.where(cand, rank[None, :], n)
    leader = jnp.where(valid, order[jnp.min(lead_rank, axis=1) % n], -1)
    return kept, leader


class ScoreHLRResult(NamedTuple):
    priority: jnp.ndarray      # (N,) negative-choice priority
    weights: jnp.ndarray       # (N,) per-candidate neg label weights


def score_hlr_neg_priority(
    key: jax.Array,
    assigned_gt_inds: jnp.ndarray,
    max_score: jnp.ndarray,      # (N,) max non-bg softmax score
    decoded_boxes: jnp.ndarray,  # (N, 4) argmax-class decoded boxes
    neg_loss: jnp.ndarray,       # (N,) no-grad CE-vs-bg per candidate
    num_expected: int,
    score_thr: float = 0.05,
    iou_thr: float = 0.5,
    bias: float = 0.0,
    k: float = 0.5,
) -> ScoreHLRResult:
    """Score-HLR negative choice + label weights
    (``score_hlr_sampler.py:102-214``): valid negatives (score above
    ``score_thr``) are grouped by NMS-Match, ranked by score inside each
    group, re-ranked globally (``imp = num_valid - rank + score``), the
    top ``num_expected`` taken with weights
    ``(bias + (1-bias)(up - imp_rank)/up)^k`` renormalized to preserve
    the original summed loss; invalid negatives backfill randomly with
    the minimum weight."""
    neg = assigned_gt_inds == 0
    n = assigned_gt_inds.shape[0]
    noise = jax.random.uniform(key, (n,)) * 0.5

    valid = neg & (max_score > score_thr)
    num_valid = valid.astype(jnp.float32).sum()

    _, leader = nms_match_leaders(decoded_boxes, max_score, valid, iou_thr)
    same_group = (leader[:, None] == leader[None, :]) \
        & valid[:, None] & valid[None, :]
    grank = _rank_in_group(max_score, same_group).astype(jnp.float32)
    imp = jnp.where(valid, num_valid - grank + max_score, -jnp.inf)

    # imp_rank: descending rank among valid
    imp_rank = _rank_in_group(
        imp, valid[:, None] & valid[None, :]).astype(jnp.float32)
    is_hlr = valid & (imp_rank < num_expected)

    up = jnp.maximum(float(num_expected), num_valid)
    w = jnp.where(is_hlr, (up - imp_rank) / up, 0.0)
    min_w = jnp.where(is_hlr.any(),
                      jnp.min(jnp.where(is_hlr, w, jnp.inf)), 1.0)
    w = jnp.where(is_hlr, w, min_w)
    w = (bias + (1.0 - bias) * w) ** k

    # normalize so the weighted loss of the *selected* slate keeps its
    # magnitude; selection = hlr first, then random invalid backfill
    priority = jnp.where(is_hlr, 3.0 + imp * 1e-6,
                         jnp.where(neg & ~valid, 1.0 + noise, noise))
    sel_idx, sel_ok = _topk_by_priority(priority, neg, num_expected)
    sel_w = jnp.where(sel_ok, w[sel_idx], 0.0)
    sel_loss = jnp.where(sel_ok, neg_loss[sel_idx], 0.0)
    ratio = sel_loss.sum() / jnp.maximum((sel_loss * sel_w).sum(), 1e-12)
    # no valid negatives at all -> plain random with weight 1
    ratio = jnp.where(num_valid > 0, ratio, 1.0)
    w = jnp.where(num_valid > 0, w * ratio, 1.0)
    return ScoreHLRResult(priority=priority, weights=w)


# ----------------------------------------------------------- entry point
def sample_pos_neg(
    key: jax.Array,
    assigned_gt_inds: jnp.ndarray,
    num: int = 512,
    pos_fraction: float = 0.25,
    pos_sampler: str = "random",
    neg_sampler: str = "random",
    max_overlaps: Optional[jnp.ndarray] = None,
    pos_loss: Optional[jnp.ndarray] = None,
    neg_loss: Optional[jnp.ndarray] = None,
    neg_cfg: Optional[dict] = None,
    score_hlr: Optional[ScoreHLRResult] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Generalized sampler (the reference's CombinedSampler,
    ``combined_sampler.py``): any positive rule x any negative rule.

    Returns (inds, is_pos, valid, neg_weights) — ``neg_weights`` is 1
    except under score-HLR. Slot layout matches
    :func:`random_sample_pos_neg`: positives first, then negatives.
    """
    k_pos, k_neg = jax.random.split(key)
    pos_mask = assigned_gt_inds > 0
    neg_mask = assigned_gt_inds == 0
    n = assigned_gt_inds.shape[0]
    num_expected_pos = int(num * pos_fraction)

    if pos_sampler == "instance_balanced":
        pos_pri = instance_balanced_pos_priority(
            k_pos, assigned_gt_inds, num_expected_pos)
    elif pos_sampler == "ohem":
        assert pos_loss is not None
        pos_pri = ohem_priority(pos_loss)
    else:
        pos_pri = jax.random.uniform(k_pos, (n,))

    neg_weights_all = jnp.ones((n,), jnp.float32)
    if neg_sampler == "iou_balanced":
        assert max_overlaps is not None
        cfg = neg_cfg or {}
        neg_pri = iou_balanced_neg_priority(
            k_neg, assigned_gt_inds, max_overlaps, num - num_expected_pos,
            floor_thr=cfg.get("floor_thr", -1.0),
            floor_fraction=cfg.get("floor_fraction", 0.0),
            num_bins=cfg.get("num_bins", 3))
    elif neg_sampler == "ohem":
        assert neg_loss is not None
        neg_pri = ohem_priority(neg_loss)
    elif neg_sampler == "score_hlr":
        assert score_hlr is not None
        neg_pri = score_hlr.priority
        neg_weights_all = score_hlr.weights
    else:
        neg_pri = jax.random.uniform(k_neg, (n,))

    pos_idx, pos_ok = _topk_by_priority(pos_pri, pos_mask, num_expected_pos)
    neg_idx, neg_ok = _topk_by_priority(neg_pri, neg_mask, num)

    n_pos = pos_ok.sum()
    slot = jnp.arange(num)
    take_pos = slot < n_pos
    neg_pick = jnp.clip(slot - n_pos, 0, num - 1)
    inds = jnp.where(
        take_pos, pos_idx[jnp.clip(slot, 0, num_expected_pos - 1)],
        neg_idx[neg_pick])
    valid = jnp.where(take_pos, True, neg_ok[neg_pick])
    neg_w = jnp.where(take_pos, 1.0, neg_weights_all[neg_idx[neg_pick]])
    return inds, take_pos, valid, neg_w
