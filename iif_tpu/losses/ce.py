"""Cross-entropy primitives with torch-compatible reduction semantics."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from iif_tpu.registry import LOSSES


def softmax_cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Per-sample CE from integer targets. Computed in fp32 for stability
    regardless of the (possibly bf16) logits dtype."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    true_logit = jnp.take_along_axis(logits, targets[..., None], axis=-1)[..., 0]
    return logz - true_logit


def reduce_loss(per_sample: jnp.ndarray, reduction: str) -> jnp.ndarray:
    if reduction == "mean":
        return per_sample.mean()
    if reduction == "sum":
        return per_sample.sum()
    if reduction == "none":
        return per_sample
    raise ValueError(f"unknown reduction {reduction!r}")


@LOSSES.register()
@dataclasses.dataclass
class CrossEntropyLoss:
    """Plain CE with optional per-class weights.

    With ``weight`` and reduction='mean' this matches
    ``torch.nn.CrossEntropyLoss(weight=w)``: sum(w_y * l) / sum(w_y)
    (the `--classif ce --deffered` path, ``initialisers.py:42-46``).
    """

    weight: Optional[jnp.ndarray] = None  # (C,)
    reduction: str = "mean"

    def __call__(self, logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
        per_sample = softmax_cross_entropy(logits, targets)
        if self.weight is not None:
            w = self.weight.astype(per_sample.dtype)[targets]
            per_sample = per_sample * w
            if self.reduction == "mean":
                return per_sample.sum() / w.sum()
        return reduce_loss(per_sample, self.reduction)


jax.tree_util.register_pytree_node(
    CrossEntropyLoss,
    lambda l: ((l.weight,), (l.reduction,)),
    lambda aux, children: CrossEntropyLoss(children[0], aux[0]),
)
