"""Detection-side IIF losses.

Rebuild of ``mmdet/models/losses/iif_loss.py:13-202`` (and the FASA
counter variants ``fasa_iif_loss.py`` / ``fasa_loss.py``):

- per-class weights come from a precomputed CSV
  (``lvis_files/idf_1204.csv``-format: header row with variant columns;
  row 0 is a background placeholder). Loading drops row 0 and appends
  1.0 for the background class (`iif_loss.py:49-50`);
- training loss: ``CE(pred * iif_weights, label)`` (`:187-192`);
- mmdet custom-loss protocol: ``custom_cls_channels`` -> C+1 channels
  (`:58,80-90`), ``custom_activation`` -> ``softmax(iif * score)``
  (`:65-78`), ``custom_accuracy`` (`:92-107`);
- the FASA variants accumulate per-class summed losses between
  ``open_cums``/``close_cums`` for adaptive sampling — here the
  accumulation is *functional*: the loss returns per-class sums alongside
  the scalar so the caller can fold them into train state (no global
  mutable buffers inside jit).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iif_tpu.losses.ce import softmax_cross_entropy
from iif_tpu.registry import LOSSES


def load_iif_csv(path: str, variant: str = "raw") -> np.ndarray:
    """Read a reference-format IDF csv column; drop the row-0 background
    placeholder and append bg weight 1.0 (``iif_loss.py:47-50``).

    Returns (C+1,) float32 where the last entry is the background class.
    """
    import pandas as pd

    col = pd.read_csv(path)[variant].tolist()
    weights = list(col[1:]) + [1.0]
    return np.asarray(weights, dtype=np.float32)


DET_IIF_VARIANTS = ("raw", "smooth", "prob", "normit", "gombit",
                    "base2", "base10")


def compute_det_iif_from_counts(counts: Sequence[int],
                                num_images_total: int,
                                variant: str = "raw") -> np.ndarray:
    """Generate detection IIF weights from per-class frequencies — exactly
    what the reference precomputed offline into ``lvis_files/idf_1204.csv``
    (verified to 1e-15 against every column of that file).

    Unlike classification IIF (where each sample has one class so
    ``N == sum(n_c)``), detection uses the *image corpus size* N as the
    denominator: for LVIS v1 train the CSV encodes ``N = 100170`` images.
    For the ``*_obj`` columns the caller passes instance counts and
    ``num_images_total = sum(instance counts)`` (CSV: 1,270,141).

    Variants (column names of ``idf_1204.csv``):
      raw    = log(N / n_c)
      smooth = log((N+1)/(n_c+1)) + 1
      prob   = log((N - n_c)/n_c)       (the logit of 1 - n_c/N)
      normit = -ndtri(n_c / N)
      gombit = -log(-log(1 - n_c/N))
      base2  = log2(N / n_c)
      base10 = log10(N / n_c)

    Appends bg weight 1.0 (``iif_loss.py:49-50``); returns (C+1,) float32.
    """
    from scipy.special import ndtri

    base = variant[:-4] if variant.endswith("_obj") else variant
    n = np.maximum(np.asarray(counts, dtype=np.float64), 1.0)
    total = float(num_images_total)
    if base == "raw":
        w = np.log(total / n)
    elif base == "smooth":
        w = np.log((total + 1.0) / (n + 1.0)) + 1.0
    elif base in ("prob", "rel"):
        w = np.log((total - n) / n)
    elif base == "normit":
        w = -ndtri(n / total)
    elif base == "gombit":
        w = -np.log(-np.log(1.0 - n / total))
    elif base == "base2":
        w = np.log2(total / n)
    elif base == "base10":
        w = np.log10(total / n)
    else:
        raise ValueError(f"unknown detection IIF variant {variant!r}; "
                         f"choose from {DET_IIF_VARIANTS} (+'_obj')")
    return np.concatenate([w, [1.0]]).astype(np.float32)


@LOSSES.register()
@dataclasses.dataclass
class DetIIFLoss:
    """IIF CE for the (C+1)-way detection classifier."""

    weights: jnp.ndarray          # (C+1,) incl. background
    loss_weight: float = 1.0

    # mmdet custom-loss protocol flags (`iif_loss.py:58-107`)
    custom_cls_channels = True
    custom_activation = True
    custom_accuracy = True

    @property
    def num_classes(self) -> int:
        return self.weights.shape[0] - 1

    def get_cls_channels(self, num_classes: int) -> int:
        return num_classes + 1

    def __call__(self, cls_score: jnp.ndarray, labels: jnp.ndarray,
                 weight: Optional[jnp.ndarray] = None,
                 avg_factor: Optional[jnp.ndarray] = None,
                 reduction: str = "mean") -> jnp.ndarray:
        scaled = cls_score * self.weights.astype(cls_score.dtype)
        per = softmax_cross_entropy(scaled, labels)
        if weight is not None:
            per = per * weight.astype(per.dtype)
        if reduction == "none":
            return self.loss_weight * per
        total = per.sum()
        if avg_factor is None:
            avg_factor = (jnp.ones_like(per).sum() if weight is None
                          else weight.sum())
        return self.loss_weight * total / jnp.maximum(avg_factor, 1.0)

    def per_class_sums(self, cls_score: jnp.ndarray, labels: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None
                       ) -> jnp.ndarray:
        """FASA cum-loss counters (`fasa_iif_loss.py:154-161`): summed
        per-sample loss bucketed by label, (C+1,)."""
        per = self(cls_score, labels, weight=weight, reduction="none")
        onehot = jax.nn.one_hot(labels, self.weights.shape[0],
                                dtype=per.dtype)
        return (onehot * per[:, None]).sum(axis=0)

    def get_activation(self, cls_score: jnp.ndarray) -> jnp.ndarray:
        """Inference scores = softmax(iif * score) (`iif_loss.py:65-78`)."""
        return jax.nn.softmax(
            cls_score.astype(jnp.float32)
            * self.weights.astype(jnp.float32), axis=-1)

    def get_accuracy(self, cls_score: jnp.ndarray, labels: jnp.ndarray
                     ) -> jnp.ndarray:
        pred = (cls_score * self.weights.astype(cls_score.dtype)).argmax(-1)
        return (pred == labels).mean() * 100.0


jax.tree_util.register_pytree_node(
    DetIIFLoss,
    lambda l: ((l.weights,), (l.loss_weight,)),
    lambda aux, ch: DetIIFLoss(ch[0], aux[0]),
)


@LOSSES.register()
@dataclasses.dataclass
class DetCrossEntropyLoss:
    """Plain (C+1)-way CE with the same calling convention (the baseline
    ``CrossEntropyLoss`` of stock mmdet configs, plus the FASA counter
    variant ``fasa_loss.py:10-101`` via ``per_class_sums``)."""

    num_classes: int = 0
    loss_weight: float = 1.0
    # use_sigmoid: per-channel BCE with one-hot targets over the C+1
    # logits (reference cross_entropy_loss.py:68-115
    # ``binary_cross_entropy`` with label one-hotting; the
    # configs/activations sigmoid baselines). Inference activation stays
    # softmax, exactly like the reference (custom_activation is False on
    # CrossEntropyLoss, bbox_head.py:349-352).
    use_sigmoid: bool = False
    custom_cls_channels = False
    custom_activation = False
    custom_accuracy = False

    def __call__(self, cls_score, labels, weight=None, avg_factor=None,
                 reduction: str = "mean"):
        if self.use_sigmoid:
            onehot = jax.nn.one_hot(labels, cls_score.shape[-1],
                                    dtype=jnp.float32)
            s = cls_score.astype(jnp.float32)
            bce = (jnp.maximum(s, 0) - s * onehot
                   + jnp.log1p(jnp.exp(-jnp.abs(s))))
            # mmdet sums the (N, C+1) elementwise BCE and divides by the
            # sample avg_factor (weight_reduce_loss) -> per-sample
            # contribution is the channel SUM
            per = bce.sum(-1)
        else:
            per = softmax_cross_entropy(cls_score, labels)
        if weight is not None:
            per = per * weight.astype(per.dtype)
        if reduction == "none":
            return self.loss_weight * per
        if avg_factor is None:
            avg_factor = (jnp.ones_like(per).sum() if weight is None
                          else weight.sum())
        return self.loss_weight * per.sum() / jnp.maximum(avg_factor, 1.0)

    def per_class_sums(self, cls_score, labels, weight=None):
        per = self(cls_score, labels, weight=weight, reduction="none")
        onehot = jax.nn.one_hot(labels, cls_score.shape[-1], dtype=per.dtype)
        return (onehot * per[:, None]).sum(axis=0)

    def get_activation(self, cls_score):
        return jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)


jax.tree_util.register_pytree_node(
    DetCrossEntropyLoss,
    lambda l: ((), (l.num_classes, l.loss_weight)),
    lambda aux, ch: DetCrossEntropyLoss(aux[0], aux[1]),
)


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   beta: float = 1.0) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


def sigmoid_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       num_classes: int, gamma: float = 2.0,
                       alpha: float = 0.25) -> jnp.ndarray:
    """Per-anchor sigmoid focal loss, the mmcv ``sigmoid_focal_loss``
    CUDA kernel's math in pure jnp (reference call site
    ``mmdet/models/losses/focal_loss.py:5``; RetinaNet/FCOS cls loss).

    ``labels`` in [0, C-1] are foreground, label == C is background
    (all-zero one-hot, the sigmoid convention). Returns the (N,) per-item
    loss summed over classes; the caller divides by ``avg_factor``
    (= num_pos in mmdet's anchor heads).
    """
    logits = logits.astype(jnp.float32)
    t = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = (jnp.maximum(logits, 0) - logits * t
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p_t = p * t + (1.0 - p) * (1.0 - t)
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    return (alpha_t * (1.0 - p_t) ** gamma * ce).sum(-1)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray,
             mode: str = "log", eps: float = 1e-6) -> jnp.ndarray:
    """IoU loss on (N, 4) xyxy boxes (reference
    ``mmdet/models/losses/iou_loss.py``: 'log' = -log(IoU), the FCOS
    default; 'linear' = 1 - IoU; 'giou' = 1 - GIoU)."""
    lt = jnp.maximum(pred[..., :2], target[..., :2])
    rb = jnp.minimum(pred[..., 2:], target[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    ap = ((pred[..., 2] - pred[..., 0])
          * (pred[..., 3] - pred[..., 1]))
    at = ((target[..., 2] - target[..., 0])
          * (target[..., 3] - target[..., 1]))
    union = ap + at - inter
    iou = inter / jnp.maximum(union, eps)
    if mode == "log":
        return -jnp.log(jnp.clip(iou, eps, 1.0))
    if mode == "linear":
        return 1.0 - iou
    # giou
    lt_e = jnp.minimum(pred[..., :2], target[..., :2])
    rb_e = jnp.maximum(pred[..., 2:], target[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0.0)
    enclose = jnp.maximum(wh_e[..., 0] * wh_e[..., 1], eps)
    giou = iou - (enclose - union) / enclose
    return 1.0 - giou
