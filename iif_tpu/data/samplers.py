"""Epoch-order samplers.

TPU-native replacement for torch DistributedSampler + catalyst
``BalanceClassSampler`` (reference ``classification/initialisers.py:154-171``,
``imbalanced_dataset.py:240-257``): samplers here just produce a global
deterministic index order per epoch; each host then takes its contiguous
per-process slice (see ``iif_tpu/parallel/mesh.py:local_batch_slice``), and
the device mesh does the rest.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np


def random_epoch_order(n: int, epoch: int, seed: int = 0) -> np.ndarray:
    """Deterministic shuffled order — DistributedSampler's seed+epoch
    convention."""
    rng = np.random.RandomState(seed + epoch)
    return rng.permutation(n)


def balanced_epoch_order(
    targets: Sequence[int], epoch: int, mode: str = "upsampling", seed: int = 0
) -> np.ndarray:
    """Class-balanced order — catalyst ``BalanceClassSampler`` semantics:
    every class contributes the same number of samples per epoch
    (max class count for 'upsampling', drawn with replacement; min class
    count for 'downsampling', subsampled), then globally shuffled.
    """
    targets = np.asarray(targets)
    classes, counts = np.unique(targets, return_counts=True)
    per_class = counts.max() if mode == "upsampling" else counts.min()
    rng = np.random.RandomState(seed + epoch)
    chunks = []
    for c in classes:
        idx = np.where(targets == c)[0]
        if mode == "upsampling":
            chunks.append(rng.choice(idx, size=per_class, replace=True))
        else:
            rng.shuffle(idx)
            chunks.append(idx[:per_class])
    order = np.concatenate(chunks)
    rng.shuffle(order)
    return order
