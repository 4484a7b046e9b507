"""Shot-stratified accuracy (many / median / few) — reference
``classification/per_shot_acc.py:62-106``.

Classes with >100 train examples are "many-shot", <20 are "low-shot", the
rest "median"; each bucket reports the mean of its per-class accuracies.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np


def shot_acc(
    preds: np.ndarray,
    labels: np.ndarray,
    train_targets: Sequence[int],
    many_shot_thr: int = 100,
    low_shot_thr: int = 20,
    acc_per_cls: bool = False,
):
    """Bucket the test classes by their TRAIN frequency, then average the
    per-class accuracies inside each bucket. One bincount per statistic —
    no per-class python loop."""
    training_labels = np.asarray(train_targets).astype(int)
    preds = np.asarray(preds)
    labels = np.asarray(labels).astype(int)

    classes = np.unique(labels)
    width = int(max(classes.max(), training_labels.max(initial=0))) + 1
    train_count = np.bincount(training_labels, minlength=width)[classes]
    test_count = np.bincount(labels, minlength=width)[classes]
    correct = np.bincount(labels[preds == labels],
                          minlength=width)[classes]
    class_accs = correct / test_count   # every class in `classes` occurs

    many_m = train_count > many_shot_thr
    low_m = train_count < low_shot_thr
    med_m = ~(many_m | low_m)

    def _mean(mask):
        return float(class_accs[mask].mean()) if mask.any() else 0.0

    if acc_per_cls:
        return _mean(many_m), _mean(med_m), _mean(low_m), class_accs.tolist()
    return _mean(many_m), _mean(med_m), _mean(low_m)
