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
    training_labels = np.asarray(train_targets).astype(int)
    preds = np.asarray(preds)
    labels = np.asarray(labels)

    train_class_count, test_class_count, class_correct = [], [], []
    for l in np.unique(labels):
        train_class_count.append(int((training_labels == l).sum()))
        test_class_count.append(int((labels == l).sum()))
        class_correct.append(int((preds[labels == l] == l).sum()))

    many, median, low = [], [], []
    for i in range(len(train_class_count)):
        acc = class_correct[i] / test_class_count[i]
        if train_class_count[i] > many_shot_thr:
            many.append(acc)
        elif train_class_count[i] < low_shot_thr:
            low.append(acc)
        else:
            median.append(acc)
    many = many or [0]
    median = median or [0]
    low = low or [0]

    if acc_per_cls:
        class_accs = [c / cnt for c, cnt in zip(class_correct, test_class_count)]
        return np.mean(many), np.mean(median), np.mean(low), class_accs
    return np.mean(many), np.mean(median), np.mean(low)
