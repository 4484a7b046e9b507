"""Long-tailed txt-list datasets (ImageNet-LT / Places-LT / iNat18).

Reference ``classification/imbalanced_dataset.py:100-259``: `<path> <label>`
txt files; train re-maps class ids sorted by descending frequency
(`:114-120`), the eval set reuses the train ``class_map`` (`:150-161`).

Image bytes are decoded on host workers; everything downstream (resize,
crop, augment, normalize) runs on device in the jitted step.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
INAT18_MEAN = (0.466, 0.471, 0.380)
INAT18_STD = (0.195, 0.194, 0.192)


def _parse_txt(root: str, txt: str):
    img_path, targets = [], []
    with open(txt) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            img_path.append(os.path.join(root, parts[0]))
            targets.append(int(parts[1]))
    return img_path, targets


def frequency_class_map(targets: Sequence[int], num_classes: int) -> List[int]:
    """old_id -> new_id with new ids sorted by descending train frequency
    (ties broken by ascending old id, matching np.argsort stability in the
    reference `imbalanced_dataset.py:115-118`)."""
    counts = np.array([np.sum(np.array(targets) == i)
                       for i in range(num_classes)])
    sorted_classes = np.argsort(-counts)
    class_map = [0] * num_classes
    for i in range(num_classes):
        class_map[sorted_classes[i]] = i
    return class_map


class LTDataset:
    """Train split: builds the frequency-sorted class map."""

    def __init__(self, root: str, txt: str, num_classes: int):
        self.num_classes = num_classes
        self.img_path, targets = _parse_txt(root, txt)
        self.class_map = frequency_class_map(targets, num_classes)
        self.targets = np.array(self.class_map)[targets].tolist()
        self.cls_num_list = [int(np.sum(np.array(self.targets) == i))
                             for i in range(num_classes)]

    def __len__(self) -> int:
        return len(self.targets)

    def get_cls_num_list(self) -> List[int]:
        return self.cls_num_list

    def load_image(self, index: int) -> np.ndarray:
        from PIL import Image

        with open(self.img_path[index], "rb") as f:
            return np.asarray(Image.open(f).convert("RGB"))


class LTDatasetEval:
    """Eval split: reuses the train class_map (`imbalanced_dataset.py:148`)."""

    def __init__(self, root: str, txt: str, class_map: Sequence[int],
                 num_classes: int):
        self.num_classes = num_classes
        self.class_map = list(class_map)
        self.img_path, targets = _parse_txt(root, txt)
        self.targets = np.array(self.class_map)[targets].tolist()

    def __len__(self) -> int:
        return len(self.targets)

    def load_image(self, index: int) -> np.ndarray:
        from PIL import Image

        with open(self.img_path[index], "rb") as f:
            return np.asarray(Image.open(f).convert("RGB"))
