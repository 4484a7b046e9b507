"""Imbalanced (long-tailed) CIFAR — reference
``classification/imbalanced_dataset.py:12-83``.

Subsamples a balanced dataset to an exponential or step imbalance profile
``n_c = n_max * imb_factor^(c/(C-1))`` with a *bit-identical* selection to
the reference: the same legacy-NumPy Mersenne-Twister sequence seeded by
``rand_number`` drives the per-class shuffles, so the retained example
indices match the torch version exactly.

Data here is plain numpy arrays (HWC uint8); decode/augment happens on
device inside the jitted step (see ``iif_tpu/data/augment.py``).
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

CIFAR10_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR10_STD = (0.2023, 0.1994, 0.2010)


def img_num_per_cls(n_total: int, cls_num: int, imb_type: str,
                    imb_factor: float) -> List[int]:
    """Per-class retained counts (``imbalanced_dataset.py:23-37``)."""
    img_max = n_total / cls_num
    out: List[int] = []
    if imb_type == "exp":
        for c in range(cls_num):
            out.append(int(img_max * (imb_factor ** (c / (cls_num - 1.0)))))
    elif imb_type == "step":
        for _ in range(cls_num // 2):
            out.append(int(img_max))
        for _ in range(cls_num // 2):
            out.append(int(img_max * imb_factor))
    else:
        out.extend([int(img_max)] * cls_num)
    return out


class ImbalancedArrays:
    """Array-backed imbalanced dataset (works for CIFAR-10/100 or any
    balanced (data, targets) pair)."""

    def __init__(
        self,
        data: np.ndarray,            # (N, H, W, C) uint8
        targets: Sequence[int],
        cls_num: int,
        imb_type: str = "exp",
        imb_factor: float = 0.01,
        rand_number: int = 0,
    ):
        self.cls_num = cls_num
        rng = np.random.RandomState(rand_number)  # == np.random.seed(rand_number)
        counts = img_num_per_cls(len(data), cls_num, imb_type, imb_factor)
        targets_np = np.array(targets, dtype=np.int64)
        classes = np.unique(targets_np)
        self.num_per_cls_dict: Dict[int, int] = {}
        new_data, new_targets = [], []
        for the_class, n_keep in zip(classes, counts):
            self.num_per_cls_dict[int(the_class)] = n_keep
            idx = np.where(targets_np == the_class)[0]
            rng.shuffle(idx)
            sel = idx[:n_keep]
            new_data.append(data[sel, ...])
            new_targets.extend([int(the_class)] * n_keep)
        self.data = np.vstack(new_data)
        self.targets = new_targets

    def __len__(self) -> int:
        return len(self.targets)

    def get_cls_num_list(self) -> List[int]:
        return [self.num_per_cls_dict[i] for i in range(self.cls_num)]


# --------------------------------------------------------------- raw CIFAR
def _load_pickle(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f, encoding="latin1")


def load_cifar(root: str, name: str = "cifar100", train: bool = True
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Load raw CIFAR batches from the standard python-pickle layout.

    Returns (data (N,32,32,3) uint8, targets (N,) int64). No download —
    the files must exist under ``root`` (``cifar-10-batches-py/`` or
    ``cifar-100-python/``).
    """
    if name == "cifar100":
        d = _load_pickle(os.path.join(root, "cifar-100-python",
                                      "train" if train else "test"))
        data = d["data"]
        targets = d["fine_labels"]
    elif name == "cifar10":
        base = os.path.join(root, "cifar-10-batches-py")
        if train:
            parts = [_load_pickle(os.path.join(base, f"data_batch_{i}"))
                     for i in range(1, 6)]
            data = np.concatenate([p["data"] for p in parts])
            targets = sum((p["labels"] for p in parts), [])
        else:
            d = _load_pickle(os.path.join(base, "test_batch"))
            data, targets = d["data"], d["labels"]
    else:
        raise ValueError(name)
    data = data.reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # -> NHWC
    return np.ascontiguousarray(data), np.asarray(targets, dtype=np.int64)


def make_synthetic_cifar(
    n_per_class: int, cls_num: int, seed: int = 0, size: int = 32,
    class_seed: int = 1234,
) -> Tuple[np.ndarray, np.ndarray]:
    """Class-separable synthetic stand-in for CIFAR when the real files are
    absent (tests / benchmarking). Each class has a distinct mean color so a
    small model can actually learn. The class palette is driven by
    ``class_seed`` (fixed by default) so train/eval splits generated with
    different ``seed`` values share the same class structure."""
    rng = np.random.RandomState(seed)
    n = n_per_class * cls_num
    targets = np.repeat(np.arange(cls_num), n_per_class)
    base = np.random.RandomState(class_seed).uniform(40, 215, size=(cls_num, 3))
    data = (base[targets][:, None, None, :]
            + rng.normal(0, 25, size=(n, size, size, 3)))
    order = rng.permutation(n)
    return (np.clip(data, 0, 255).astype(np.uint8)[order],
            targets[order].astype(np.int64))
