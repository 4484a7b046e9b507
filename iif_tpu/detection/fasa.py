"""FASA — Feature Augmentation and Sampling Adaptation, TPU-native.

Rebuild of ``mmdet/models/roi_heads/bbox_heads/fasa_bbox_head.py`` (EMA
per-class feature statistics `fa_update`/`fa_update_push` :118-148,
virtual-feature generation `fa_generate` :150-171, loss-driven adaptive
sampling `dynamic_sampling` :173-215 with sklearn AffinityPropagation, and
the aug CE term in `loss` :283-299) plus the val-epoch cum-loss counters of
``fasa_iif_loss.py:60-71,154-161``.

TPU-first redesign:
- all FASA state is a **functional pytree** (`FasaState`) threaded through
  the jitted train step — no mutable nn.Parameters, checkpointing it is
  free (it rides in the train state exactly like the reference's
  requires_grad=False params ride in state_dict);
- `fa_update` becomes one one-hot matmul (segment mean/var over classes)
  instead of a python loop over unique labels;
- `fa_generate` samples a virtual feature for EVERY class each step and
  weights by the Bernoulli(prob_list) draw — static shapes, identical
  expectation;
- `dynamic_sampling` (per-epoch, host): pairwise distances + sklearn
  AffinityPropagation exactly as the reference (clustering stays on host —
  it is a between-epoch O(C^2) op, not worth a kernel).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FasaState(NamedTuple):
    feature_mean: jnp.ndarray   # (C, D)
    feature_var: jnp.ndarray    # (C, D)
    feature_used: jnp.ndarray   # (C,)
    prob_list: jnp.ndarray      # (C,)
    cum_losses: jnp.ndarray     # (C+1,) val-epoch accumulators
    cum_labels: jnp.ndarray     # (C+1,)
    cum_loss_t0: jnp.ndarray    # (C+1,) previous-epoch normalized losses


def init_fasa_state(
    instance_counts: np.ndarray,   # (C,) per-class instance counts
    feat_dim: int = 1024,
    instance_prob_power: float = 1.0,
    instance_prob_scale: float = 1.0,
) -> FasaState:
    """Initial sampling probs ``scale * ((1/n_c)/sum)^power`` clamped to
    [0,1] (`fasa_bbox_head.py:51-61`, counts from ``LVIS_INSTANCES``)."""
    c = len(instance_counts)
    inv = 1.0 / np.maximum(np.asarray(instance_counts, np.float64), 1.0)
    prob = instance_prob_scale * (inv / inv.sum()) ** instance_prob_power
    prob = np.clip(prob, 0.0, 1.0)
    return FasaState(
        feature_mean=jnp.zeros((c, feat_dim), jnp.float32),
        feature_var=jnp.zeros((c, feat_dim), jnp.float32),
        feature_used=jnp.zeros(c, jnp.float32),
        prob_list=jnp.asarray(prob, jnp.float32),
        cum_losses=jnp.zeros(c + 1, jnp.float32),
        cum_labels=jnp.zeros(c + 1, jnp.float32),
        cum_loss_t0=jnp.zeros(c + 1, jnp.float32),
    )


def fasa_update(state: FasaState, embeddings: jnp.ndarray,
                labels: jnp.ndarray, pos_weight: jnp.ndarray,
                decay_ratio: float = 0.1) -> FasaState:
    """EMA update of per-class feature mean/var from this step's positive
    RoI embeddings — one-hot segment statistics, fully batched.

    embeddings (R, D), labels (R,), pos_weight (R,) 1 for real positives.
    """
    c = state.feature_mean.shape[0]
    emb = jax.lax.stop_gradient(embeddings.astype(jnp.float32))
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32) * pos_weight[:, None]
    counts = onehot.sum(axis=0)                        # (C,)
    safe = jnp.maximum(counts, 1.0)
    mean = (onehot.T @ emb) / safe[:, None]            # (C, D)
    sq = (onehot.T @ (emb * emb)) / safe[:, None]
    var_biased = sq - mean * mean
    # unbiased correction n/(n-1) when n > 1 (`fa_update_push`)
    corr = jnp.where(counts > 1, counts / jnp.maximum(counts - 1.0, 1.0), 1.0)
    var = jnp.maximum(var_biased, 0.0) * corr[:, None]

    seen = counts > 0
    first = seen & (state.feature_used == 0)
    ema_mean = decay_ratio * mean + (1 - decay_ratio) * state.feature_mean
    ema_var = decay_ratio * var + (1 - decay_ratio) * state.feature_var
    new_mean = jnp.where(first[:, None], mean,
                         jnp.where(seen[:, None], ema_mean,
                                   state.feature_mean))
    new_var = jnp.where(first[:, None], var,
                        jnp.where(seen[:, None], ema_var, state.feature_var))
    new_used = state.feature_used + first.astype(jnp.float32)
    return state._replace(feature_mean=new_mean, feature_var=new_var,
                          feature_used=new_used)


def fasa_generate(state: FasaState, key: jax.Array
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Virtual features for all classes + selection weights.

    Returns (features (C, D), labels (C,), select (C,) in {0,1}):
    class c is selected iff U(0,1) < prob_list[c] and its stats exist
    (`fa_generate`). Downstream weights make unselected rows zero-loss.
    """
    c, d = state.feature_mean.shape
    k_sel, k_noise = jax.random.split(key)
    rand = jax.random.uniform(k_sel, (c,))
    select = ((rand < state.prob_list) & (state.feature_used > 0)
              ).astype(jnp.float32)
    noise = jax.random.normal(k_noise, (c, d))
    feats = state.feature_mean + jnp.sqrt(
        jnp.maximum(state.feature_var, 0.0)) * noise
    labels = jnp.arange(c)
    return feats, labels, select


def fasa_aug_loss(state: FasaState, key: jax.Array, fc_cls_apply,
                  loss_cls, loss_aug_weight: float = 0.1) -> jnp.ndarray:
    """Aux CE on virtual features through the classifier only
    (`fasa_bbox_head.py:283-299`), weight ``loss_aug_weight``."""
    feats, labels, select = fasa_generate(state, key)
    scores = fc_cls_apply(feats)
    w = select * loss_aug_weight
    return loss_cls(scores, labels, weight=w,
                    avg_factor=jnp.maximum(select.sum(), 1.0))


def fasa_accumulate_val(state: FasaState, loss_cls, cls_score: jnp.ndarray,
                        labels: jnp.ndarray,
                        weight: Optional[jnp.ndarray] = None) -> FasaState:
    """Val-pass accumulation of per-class summed losses + label counts
    (the open_cums/close_cums window, `fasa_iif_loss.py:60-71,154-161`)."""
    sums = loss_cls.per_class_sums(cls_score, labels, weight=weight)
    onehot = jax.nn.one_hot(labels, state.cum_losses.shape[0],
                            dtype=jnp.float32)
    if weight is not None:
        onehot = onehot * weight[:, None]
    return state._replace(cum_losses=state.cum_losses + sums,
                          cum_labels=state.cum_labels + onehot.sum(0))


def fasa_reset_cums(state: FasaState) -> FasaState:
    return state._replace(cum_losses=jnp.zeros_like(state.cum_losses),
                          cum_labels=jnp.zeros_like(state.cum_labels))


def fasa_dynamic_sampling(
    state: FasaState,
    dynamic_up: float = 1.1,
    dynamic_down: float = 0.9,
) -> FasaState:
    """Between-epoch adaptive sampling (`dynamic_sampling`,
    `fasa_bbox_head.py:173-215`): cluster class mean-features with
    AffinityPropagation on precomputed squared distances; clusters whose
    normalized cum-loss rose get prob x ``dynamic_down``, fell get
    x ``dynamic_up``. Host-side (numpy + sklearn), called outside jit.

    In multi-host runs, psum the cum counters before calling (the
    reference all-reduces via ``reduce_mean``).
    """
    from sklearn.cluster import AffinityPropagation

    mean = np.asarray(state.feature_mean, np.float64)
    cum_losses = np.asarray(state.cum_losses, np.float64)
    cum_labels = np.asarray(state.cum_labels, np.float64)
    sum_labels = max(cum_labels.sum(), 1.0)
    t1 = cum_losses / sum_labels
    t0 = np.asarray(state.cum_loss_t0, np.float64)
    if t0.sum() == 0:
        t0 = t1.copy()

    xy = mean @ mean.T
    sq = (mean * mean).sum(1)
    dist = sq[:, None] - 2 * xy + sq[None, :]
    clustering = AffinityPropagation(
        random_state=1, affinity="precomputed").fit(dist)
    labels = clustering.labels_

    prob = np.asarray(state.prob_list, np.float64).copy()
    for g in range(labels.max() + 1):
        sel = np.flatnonzero(labels == g)
        delta = t1[sel].sum() - t0[sel].sum()
        if delta > 0:
            prob[sel] = np.clip(prob[sel] * dynamic_down, 0.0, 1.0)
        elif delta < 0:
            prob[sel] = np.clip(prob[sel] * dynamic_up, 0.0, 1.0)

    return state._replace(
        prob_list=jnp.asarray(prob, jnp.float32),
        cum_loss_t0=jnp.asarray(t1, jnp.float32),
        cum_losses=jnp.zeros_like(state.cum_losses),
        cum_labels=jnp.zeros_like(state.cum_labels))
