"""Reweighting / long-tail loss family beyond IIF.

TPU-native rebuilds of the remaining reference loss modules
(``mmdet/models/losses/``):

- ``SeesawLoss`` — seesaw_loss.py:12-262 (Seesaw CE for long-tailed
  instance segmentation, CVPR 2021). The reference keeps a mutable
  ``cum_samples`` buffer updated with a python loop over
  ``labels.unique()``; here the counters are a pytree leaf of the loss
  object and the update is a one-hot matmul, so the whole thing lives
  inside jit and the trainer threads the new counts functionally (the
  same idiom as the FASA cum-loss counters).
- ``ghm_c_loss`` / ``ghm_r_loss`` — ghm_loss.py:23-218 (GHM-C / GHM-R,
  AAAI 2019). The reference loops over bins with ``.item()`` syncs; here
  the histogram is one bucketize + segment-sum, fully vectorized, and the
  momentum accumulator is functional state (returned, not mutated).
- ``balanced_l1_loss`` — balanced_l1_loss.py:12-56 (Libra R-CNN).
- ``isr_p`` / ``carl_loss`` — pisa_loss.py:9-180 (PISA, CVPR 2020).
  The reference computes IoU-HLR with nested python loops over unique
  labels and gts plus two sorts; here both hierarchical ranks come from
  O(N^2) masked comparison matrices (N is the static 512-RoI slate, so
  the matrices are small and MXU-friendly) — identical ranks for
  distinct IoUs, no host sync.

All functions take padded fixed-shape slates with weight masks (0 =
padding), matching the rest of the detection stack.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from iif_tpu.losses.ce import softmax_cross_entropy
from iif_tpu.registry import LOSSES


# ------------------------------------------------------------------ seesaw
def seesaw_ce_loss(cls_score: jnp.ndarray, labels: jnp.ndarray,
                   cum_samples: jnp.ndarray, p: float, q: float,
                   eps: float) -> jnp.ndarray:
    """Per-sample Seesaw CE (``seesaw_loss.py:12-77``).

    cls_score (N, C) class-only logits, labels (N,) in [0, C),
    cum_samples (C,) per-class cumulative sample counts. Returns (N,)
    unreduced losses; the caller applies weights/masks.
    """
    num_classes = cls_score.shape[-1]
    cls_score = cls_score.astype(jnp.float32)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    seesaw = jnp.ones((labels.shape[0], num_classes), jnp.float32)

    if p > 0:
        cum = jnp.maximum(cum_samples.astype(jnp.float32), 1.0)
        ratio = cum[None, :] / cum[:, None]            # (C, C)
        sample_w = jnp.where(ratio < 1.0, ratio ** p, 1.0)
        seesaw = seesaw * sample_w[labels]             # mitigation

    if q > 0:
        scores = jax.nn.softmax(jax.lax.stop_gradient(cls_score), axis=-1)
        self_scores = jnp.take_along_axis(
            scores, labels[:, None], axis=-1)
        score_ratio = scores / jnp.maximum(self_scores, eps)
        comp = jnp.where(score_ratio > 1.0, score_ratio ** q, 1.0)
        seesaw = seesaw * comp                          # compensation

    shifted = cls_score + jnp.log(seesaw) * (1.0 - onehot)
    return softmax_cross_entropy(shifted, labels)


@LOSSES.register()
@dataclasses.dataclass
class SeesawLoss:
    """Seesaw loss with the mmdet custom-loss protocol
    (``seesaw_loss.py:80-262``): the classifier emits C+2 channels —
    C class logits plus a 2-way objectness pair — and the activation
    multiplies class softmax by P(object).

    ``cum_samples`` (C+1, incl. background) is a traced pytree leaf; call
    :meth:`update_cum` with the step's labels and thread the result back
    (see ``maskrcnn_loss``), mirroring the reference's in-forward buffer
    accumulation at ``seesaw_loss.py:229-233``.
    """

    cum_samples: jnp.ndarray      # (C+1,) float
    p: float = 0.8
    q: float = 2.0
    eps: float = 1e-2
    loss_weight: float = 1.0

    custom_cls_channels = True
    custom_activation = True
    custom_accuracy = True

    @property
    def num_classes(self) -> int:
        return self.cum_samples.shape[0] - 1

    def get_cls_channels(self, num_classes: int) -> int:
        return num_classes + 2

    def _split(self, cls_score):
        return cls_score[..., :-2], cls_score[..., -2:]

    def update_cum(self, labels: jnp.ndarray,
                   weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """New cum_samples after counting this step's (valid) labels."""
        onehot = jax.nn.one_hot(labels, self.num_classes + 1,
                                dtype=jnp.float32)
        if weight is not None:
            onehot = onehot * (weight > 0).astype(jnp.float32)[:, None]
        return self.cum_samples + onehot.sum(axis=0)

    def __call__(self, cls_score: jnp.ndarray, labels: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor=None, reduction: str = "mean") -> jnp.ndarray:
        """Summed classes + objectness loss (the reference returns them
        as a dict and the runner adds them; ``seesaw_loss.py:240-262``)."""
        c = self.num_classes
        lw = (jnp.ones_like(labels, jnp.float32) if weight is None
              else weight.astype(jnp.float32))
        score_classes, score_obj = self._split(cls_score)
        pos = (labels < c).astype(jnp.float32) * (lw > 0)

        per_cls = seesaw_ce_loss(score_classes, jnp.clip(labels, 0, c - 1),
                                 self.cum_samples[:c], self.p, self.q,
                                 self.eps)
        obj_labels = (labels == c).astype(jnp.int32)
        per_obj = softmax_cross_entropy(
            score_obj.astype(jnp.float32), obj_labels)

        if reduction == "none":
            return self.loss_weight * (per_cls * pos + per_obj) * lw
        # classes: mean over positive samples (reference computes the CE
        # on the pos subset with avg_factor=None -> plain mean)
        l_classes = (per_cls * pos * lw).sum() / jnp.maximum(pos.sum(), 1.0)
        # objectness: mean over all (valid) samples
        denom = (lw > 0).astype(jnp.float32).sum() if avg_factor is None \
            else avg_factor
        l_obj = (per_obj * lw).sum() / jnp.maximum(denom, 1.0)
        return self.loss_weight * (l_classes + l_obj)

    def get_activation(self, cls_score: jnp.ndarray) -> jnp.ndarray:
        """(…, C+2) -> (…, C+1) scores: class softmax x P(pos), bg =
        P(neg) (``seesaw_loss.py:156-176``)."""
        score_classes, score_obj = self._split(
            cls_score.astype(jnp.float32))
        cls_sm = jax.nn.softmax(score_classes, axis=-1)
        obj_sm = jax.nn.softmax(score_obj, axis=-1)
        return jnp.concatenate(
            [cls_sm * obj_sm[..., :1], obj_sm[..., 1:]], axis=-1)

    def get_accuracy(self, cls_score, labels):
        score_classes, _ = self._split(cls_score)
        pred = score_classes.argmax(-1)
        pos = labels < self.num_classes
        return ((pred == labels) * pos).sum() / jnp.maximum(
            pos.sum(), 1) * 100.0


jax.tree_util.register_pytree_node(
    SeesawLoss,
    lambda l: ((l.cum_samples,), (l.p, l.q, l.eps, l.loss_weight)),
    lambda aux, ch: SeesawLoss(ch[0], *aux),
)


# --------------------------------------------------------------------- GHM
def _ghm_weights(g: jnp.ndarray, valid: jnp.ndarray, tot: jnp.ndarray,
                 bins: int, momentum: float,
                 acc_sum: Optional[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Gradient-density weights shared by GHM-C/R (``ghm_loss.py:92-115,
    190-212``): histogram g into ``bins`` unit regions, weight each
    sample by tot / (its bin's population), normalize by the number of
    non-empty bins. Fully vectorized (the reference loops bins on host)."""
    idx = jnp.clip((g * bins).astype(jnp.int32), 0, bins - 1)
    validf = valid.astype(jnp.float32)
    counts = jnp.zeros((bins,), jnp.float32).at[idx.reshape(-1)].add(
        validf.reshape(-1))
    nonempty = counts > 0
    if momentum > 0:
        acc = jnp.where(nonempty,
                        momentum * acc_sum + (1.0 - momentum) * counts,
                        acc_sum)
        denom = acc
    else:
        acc = acc_sum
        denom = counts
    n = nonempty.astype(jnp.float32).sum()
    per_bin = jnp.where(nonempty, tot / jnp.maximum(denom, 1e-12), 0.0)
    weights = per_bin[idx] * validf / jnp.maximum(n, 1.0)
    return weights, acc


def ghm_c_loss(pred: jnp.ndarray, target: jnp.ndarray,
               label_weight: jnp.ndarray, bins: int = 10,
               momentum: float = 0.0,
               acc_sum: Optional[jnp.ndarray] = None,
               loss_weight: float = 1.0
               ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """GHM-C (``ghm_loss.py:23-118``): BCE-with-logits reweighted by
    inverse gradient density. pred/target/label_weight (N, C) with
    binary targets. Returns (scalar loss, new acc_sum)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    valid = label_weight > 0
    tot = jnp.maximum(valid.astype(jnp.float32).sum(), 1.0)
    g = jax.lax.stop_gradient(jnp.abs(jax.nn.sigmoid(pred) - target))
    weights, acc = _ghm_weights(g, valid, tot, bins, momentum, acc_sum)
    ce = (jnp.maximum(pred, 0) - pred * target
          + jnp.log1p(jnp.exp(-jnp.abs(pred))))
    return loss_weight * (ce * weights).sum() / tot, acc


def ghm_r_loss(pred: jnp.ndarray, target: jnp.ndarray,
               label_weight: jnp.ndarray, mu: float = 0.02,
               bins: int = 10, momentum: float = 0.0,
               acc_sum: Optional[jnp.ndarray] = None,
               loss_weight: float = 1.0
               ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """GHM-R (``ghm_loss.py:121-218``): authentic-smooth-L1
    sqrt(d^2+mu^2)-mu reweighted by inverse gradient density; note the
    reference normalizes by sum(label_weight), not the valid count."""
    pred = pred.astype(jnp.float32)
    diff = pred - target
    loss = jnp.sqrt(diff * diff + mu * mu) - mu
    g = jax.lax.stop_gradient(
        jnp.abs(diff / jnp.sqrt(mu * mu + diff * diff)))
    valid = label_weight > 0
    tot = jnp.maximum(label_weight.astype(jnp.float32).sum(), 1.0)
    weights, acc = _ghm_weights(g, valid, tot, bins, momentum, acc_sum)
    return loss_weight * (loss * weights).sum() / tot, acc


# -------------------------------------------------------------- balanced L1
def balanced_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     beta: float = 1.0, alpha: float = 0.5,
                     gamma: float = 1.5) -> jnp.ndarray:
    """Elementwise balanced L1 (Libra R-CNN,
    ``balanced_l1_loss.py:12-56``); the caller applies weights and
    reduction like the other regression losses."""
    diff = jnp.abs(pred - target)
    b = jnp.e ** (gamma / alpha) - 1.0
    small = (alpha / b * (b * diff + 1.0) * jnp.log(b * diff / beta + 1.0)
             - alpha * diff)
    large = gamma * diff + gamma / b - alpha * beta
    return jnp.where(diff < beta, small, large)


# -------------------------------------------------------------------- PISA
def _group_rank_desc(score: jnp.ndarray, same_group: jnp.ndarray
                     ) -> jnp.ndarray:
    """Descending rank of score[i] within its group: the number of group
    members strictly greater (ties broken by lower index first, matching
    a stable descending sort)."""
    n = score.shape[0]
    gt_mask = score[None, :] > score[:, None]
    tie_mask = (score[None, :] == score[:, None]) & (
        jnp.arange(n)[None, :] < jnp.arange(n)[:, None])
    return ((gt_mask | tie_mask) & same_group).astype(jnp.int32).sum(1)


def isr_p(cls_score: jnp.ndarray,      # (N, C+1) logits
          labels: jnp.ndarray,          # (N,) bg = num_classes
          label_weights: jnp.ndarray,   # (N,)
          ious: jnp.ndarray,            # (N,) aligned IoU(decoded pred, tgt)
          gt_inds: jnp.ndarray,         # (N,) global matched-gt id
          loss_cls,                     # callable w/ reduction='none'
          num_classes: int,
          k: float = 2.0,
          bias: float = 0.0) -> jnp.ndarray:
    """Importance-based Sample Reweighting, positive part
    (``pisa_loss.py:9-119``): IoU hierarchical local rank. Samples are
    rank-sorted by IoU within each (label, gt) group, the group rank is
    folded back into the IoU, and a second per-label rank produces the
    importance weight, renormalized so the weighted cls loss keeps its
    original magnitude. Returns new label_weights.

    The caller supplies the decoded-box IoUs and globally-offset gt ids
    (the reference derives them from SamplingResult objects inside the
    function); padded rows carry weight 0 and keep it.
    """
    pos = (labels < num_classes) & (label_weights > 0)
    posf = pos.astype(jnp.float32)
    num_pos = posf.sum()

    label_counts = jnp.zeros((num_classes,), jnp.float32).at[
        jnp.clip(labels, 0, num_classes - 1)].add(posf)
    max_l_num = jnp.maximum(label_counts.max(), 1.0)

    same_label = (labels[:, None] == labels[None, :]) & pos[:, None] \
        & pos[None, :]
    same_gt = same_label & (gt_inds[:, None] == gt_inds[None, :])

    t_rank = _group_rank_desc(ious, same_gt).astype(jnp.float32)
    ious_adj = ious + (max_l_num - t_rank)
    l_rank = _group_rank_desc(ious_adj, same_label).astype(jnp.float32)

    w = label_weights * (max_l_num - l_rank) / max_l_num
    imp = (bias + w * (1.0 - bias)) ** k

    per = loss_cls(cls_score, labels, reduction="none")
    ori = (per * label_weights * posf).sum()
    new = (per * imp * posf).sum()
    ratio = ori / jnp.maximum(new, 1e-12)
    imp = imp * ratio

    return jnp.where(pos & (num_pos > 0), imp, label_weights)


def carl_loss(cls_score: jnp.ndarray,   # (N, C+1) logits
              labels: jnp.ndarray,       # (N,) bg = num_classes
              label_weights: jnp.ndarray,
              bbox_pred_sel: jnp.ndarray,   # (N, 4) class-selected deltas
              bbox_targets: jnp.ndarray,    # (N, 4)
              loss_bbox_fn,                 # elementwise, e.g. smooth_l1
              num_classes: int,
              k: float = 1.0,
              bias: float = 0.2,
              avg_factor: Optional[jnp.ndarray] = None,
              sigmoid: bool = False) -> jnp.ndarray:
    """Classification-Aware Regression Loss (``pisa_loss.py:123-180``):
    regression loss reweighted by the (gradient-carrying) classification
    score of the assigned class, normalized to sum to num_pos."""
    pos = (labels < num_classes) & (label_weights > 0)
    posf = pos.astype(jnp.float32)
    num_pos = posf.sum()

    idx = jnp.clip(labels, 0, num_classes - 1)
    if sigmoid:
        pos_cls = jnp.take_along_axis(
            jax.nn.sigmoid(cls_score.astype(jnp.float32)),
            idx[:, None], axis=-1)[:, 0]
    else:
        pos_cls = jnp.take_along_axis(
            jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1),
            idx[:, None], axis=-1)[:, 0]
    w = (bias + (1.0 - bias) * pos_cls) ** k * posf
    ratio = num_pos / jnp.maximum(w.sum(), 1e-12)
    w = w * ratio

    if avg_factor is None:
        avg_factor = jnp.asarray(labels.shape[0], jnp.float32)
    reg = loss_bbox_fn(bbox_pred_sel, bbox_targets) / avg_factor
    return jnp.where(num_pos > 0,
                     (reg * w[:, None]).sum(), 0.0 * cls_score.sum())
