"""Fixed-size positive/negative RoI sampling.

Rebuild of ``mmdet/core/bbox/samplers/random_sampler.py:9-82`` (num=512,
pos_fraction=0.25, add_gt_as_proposals) with static shapes: instead of
concatenating variable-length pos/neg index tensors, we emit a fixed (num,)
index vector plus pos/neg masks. Selection uses Gumbel-top-k (random keys +
top_k) so "sample k uniformly without replacement from a masked set" is one
fused sort — no host RNG, no dynamic shapes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _masked_topk_choice(key: jax.Array, mask: jnp.ndarray, k: int
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pick up to k True positions of ``mask`` uniformly at random.

    Returns (indices (k,), chosen_valid (k,)): invalid slots point at the
    first True element (or 0) and are masked out by ``chosen_valid``.

    Above 8192 candidates the Gumbel top-k runs through the TPU-native
    ``approx_max_k`` (a full 268k-anchor sort per image dominates RPN
    target assembly otherwise). With iid noise keys the approximate
    reduction still selects a uniform random subset — dropping a
    candidate that shares a reduction bin with a higher-noise one is
    itself symmetric over positions; the only deviation is that when
    valid candidates are SCARCE (< a few per bin) a slot can come back
    invalid even though a candidate existed. Scarce happens only for
    positives, where the validity mask keeps correctness and the
    occasional one-fewer-positive is statistically immaterial.
    """
    n = mask.shape[0]
    noise = jax.random.uniform(key, (n,))
    scores = jnp.where(mask, noise, -1.0)
    k_eff = min(k, n)
    if n >= 8192:
        top_scores, idx = jax.lax.approx_max_k(scores, k_eff,
                                               recall_target=0.95)
    else:
        top_scores, idx = jax.lax.top_k(scores, k_eff)
    if k_eff < k:  # candidate pool smaller than request: pad
        top_scores = jnp.concatenate(
            [top_scores, jnp.full(k - k_eff, -1.0, top_scores.dtype)])
        idx = jnp.concatenate([idx, jnp.zeros(k - k_eff, idx.dtype)])
    valid = top_scores >= 0.0
    idx = jnp.where(valid, idx, jnp.argmax(mask.astype(jnp.int32)))
    return idx, valid


def random_sample_pos_neg(
    key: jax.Array,
    assigned_gt_inds: jnp.ndarray,   # (N,) -1 ignore / 0 neg / i+1 pos
    num: int = 512,
    pos_fraction: float = 0.25,
    neg_pos_ub: float = -1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (inds (num,), is_pos (num,), valid (num,)).

    Positives fill the first ``num_expected_pos`` slots (fewer if scarce),
    negatives fill the rest — mirroring the reference's concat order
    (pos then neg), which downstream target assembly relies on.
    """
    k_pos, k_neg = jax.random.split(key)
    pos_mask = assigned_gt_inds > 0
    neg_mask = assigned_gt_inds == 0

    num_expected_pos = int(num * pos_fraction)
    pos_idx, pos_ok = _masked_topk_choice(k_pos, pos_mask, num_expected_pos)

    # negatives: fill every slot not taken by a real positive
    num_neg_slots = num - num_expected_pos
    neg_idx, neg_ok = _masked_topk_choice(k_neg, neg_mask, num)
    # shift negatives into the tail + backfill unused positive slots
    n_pos = pos_ok.sum()
    slot = jnp.arange(num)
    # slot i takes: pos_idx[i] if i < n_pos else neg_idx[i - n_pos]
    take_pos = slot < n_pos
    neg_pick = jnp.clip(slot - n_pos, 0, num - 1)
    inds = jnp.where(take_pos, pos_idx[jnp.clip(slot, 0, num_expected_pos - 1)],
                     neg_idx[neg_pick])
    is_pos = take_pos
    valid = jnp.where(take_pos, True, neg_ok[neg_pick])
    return inds, is_pos, valid
