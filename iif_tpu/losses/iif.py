"""Inverse Image Frequency (IIF) loss — the paper's core, TPU-native.

The whole method is a fixed per-class weight vector ``w_c = f(inverse image
frequency of class c)`` multiplied into the classifier logits both in the
training CE and at inference (reference: ``classification/custom.py:6-39``).

Because ``w`` is a constant (C,) vector, the natural TPU formulation is a
single fused elementwise-scale + log-softmax inside the jitted step — XLA
fuses ``logits * w`` into the epilogue of the classifier matmul, so IIF adds
zero extra HBM traffic. No kernel is needed; the fusion IS the kernel.

All seven weight variants of the reference are reproduced bit-for-bit in
float64 then cast (``custom.py:16-23``), with optional Lp normalization of
the weight vector (``custom.py:25-26``).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from scipy.special import ndtri

from iif_tpu.losses.ce import softmax_cross_entropy, reduce_loss
from iif_tpu.registry import LOSSES

IIF_VARIANTS = ("raw", "smooth", "rel", "normit", "gombit", "base2", "base10")


def compute_iif_weights(
    class_counts: Sequence[int],
    variant: str = "raw",
    iif_norm: int = 0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Per-class IIF weight vector from train-set class frequencies.

    Variants (reference ``classification/custom.py:16-23``):
      raw    = log(N / n_c)
      smooth = log((N+1)/(n_c+1)) + 1
      rel    = log((N - n_c)/n_c)
      normit = -ndtri(n_c / N)           (probit of the complement)
      gombit = -log(-log(1 - n_c/N))
      base2  = log2(N / n_c)
      base10 = log10(N / n_c)

    ``iif_norm`` > 0 divides by the Lp norm of the vector (``custom.py:25``).
    """
    freqs = np.asarray(class_counts, dtype=np.float64)
    if freqs.ndim != 1 or freqs.size == 0:
        raise ValueError("class_counts must be a non-empty 1-D sequence")
    total = freqs.sum()
    p = freqs / total
    if variant == "raw":
        w = np.log(total / freqs)
    elif variant == "smooth":
        w = np.log((total + 1.0) / (freqs + 1.0)) + 1.0
    elif variant == "rel":
        w = np.log((total - freqs) / freqs)
    elif variant == "normit":
        w = -ndtri(p)
    elif variant == "gombit":
        w = -np.log(-np.log(1.0 - p))
    elif variant == "base2":
        w = np.log2(total / freqs)
    elif variant == "base10":
        w = np.log10(total / freqs)
    else:
        raise ValueError(f"unknown IIF variant {variant!r}; choose from {IIF_VARIANTS}")
    if iif_norm > 0:
        w = w / np.linalg.norm(w, ord=iif_norm)
    return jnp.asarray(w, dtype=dtype)


@LOSSES.register()
@dataclasses.dataclass
class IIFLoss:
    """CE on IIF-scaled logits; at inference, returns the scaled logits.

    Matches ``classification/custom.py:28-39``:
      train: ``loss = CE(logits * iif, y)`` with optional per-class sample
        weights ``w_y`` (deferred re-weighting; torch semantics: per-sample
        loss is multiplied by ``w_y`` *before* the plain mean over batch).
      infer: ``logits * iif``.

    The weights tensor is an ordinary jnp array so the loss closure jits and
    shards transparently; all arithmetic happens on device.
    """

    weights: jnp.ndarray  # (C,) IIF vector
    reduction: str = "mean"
    class_weights: Optional[jnp.ndarray] = None  # (C,) deferred re-weighting

    @classmethod
    def from_counts(cls, class_counts: Sequence[int], variant: str = "raw",
                    iif_norm: int = 0, reduction: str = "mean",
                    class_weights: Optional[jnp.ndarray] = None) -> "IIFLoss":
        return cls(
            weights=compute_iif_weights(class_counts, variant, iif_norm),
            reduction=reduction,
            class_weights=class_weights,
        )

    def __call__(self, logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        scaled = logits * self.weights.astype(logits.dtype)
        per_sample = softmax_cross_entropy(scaled, targets)
        if self.class_weights is not None:
            per_sample = per_sample * self.class_weights.astype(per_sample.dtype)[targets]
        return reduce_loss(per_sample, self.reduction)

    def transform(self, logits: jnp.ndarray) -> jnp.ndarray:
        """Inference-time IIF application (``custom.py:37-39``)."""
        return logits * self.weights.astype(logits.dtype)

    # Marker used by the trainer to decide whether to apply the transform at
    # eval time (reference gates on ``hasattr(criterion, 'iif')``,
    # ``classification/train.py:104-105``).
    iif = True


jax.tree_util.register_pytree_node(
    IIFLoss,
    lambda l: ((l.weights, l.class_weights), (l.reduction,)),
    lambda aux, children: IIFLoss(children[0], aux[0], children[1]),
)
