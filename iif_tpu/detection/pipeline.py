"""Detection data pipeline: host decode + keep-ratio resize + flip +
normalize + pad to a static canvas, emitting the padded batch dict the
jitted train step consumes.

Rebuild of the mmdet dict-transform pipeline on the MaskRCNN path
(``mmdet/datasets/pipelines/``: LoadImageFromFile, LoadAnnotations,
Resize keep-ratio to (1333, 800), RandomFlip 0.5, Normalize, Pad
size_divisor=32, DefaultFormatBundle/Collect — SURVEY.md §2.3).

TPU-first deltas:
- ONE static canvas (pad_h, pad_w) for every batch instead of per-batch
  max-shape padding: a single compiled program, zero recompiles;
- multiscale train resize (6 scales) supported by sampling the scale on
  the host — the canvas stays fixed, only the image content scales;
- masks are rasterized to the padded canvas at load time so mask targets
  are a pure device-side RoIAlign crop.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from iif_tpu.detection.datasets import CocoStyleDataset
from iif_tpu.detection.mask_utils import segm_to_bitmap

IMAGENET_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.array([58.395, 57.12, 57.375], np.float32)

# reference train scales: (1333, 800) single-scale for the 1x configs
DEFAULT_SCALE = (1333, 800)


def keep_ratio_scale(h: int, w: int, scale: Tuple[int, int]) -> float:
    """mmdet ``rescale_size``: factor = min(max_long/long, max_short/short)."""
    max_long, max_short = max(scale), min(scale)
    return min(max_long / max(h, w), max_short / min(h, w))


class DetectionPipeline:
    def __init__(
        self,
        canvas: Tuple[int, int] = (800, 1344),   # (H, W), 32-divisible
        scales: Sequence[Tuple[int, int]] = (DEFAULT_SCALE,),
        flip_prob: float = 0.5,
        max_gt: int = 100,
        with_mask: bool = True,
        mask_stride: int = 1,
        mean: np.ndarray = IMAGENET_MEAN,
        std: np.ndarray = IMAGENET_STD,
    ):
        self.canvas = canvas
        self.scales = list(scales)
        self.flip_prob = flip_prob
        self.max_gt = max_gt
        self.with_mask = with_mask
        self.mask_stride = mask_stride
        self.mean = mean
        self.std = std

    def __call__(self, image: np.ndarray, ann: Dict, rng: np.random.RandomState,
                 train: bool = True) -> Dict[str, np.ndarray]:
        import cv2

        h0, w0 = image.shape[:2]
        scale = self.scales[rng.randint(len(self.scales))] if train \
            else self.scales[0]
        factor = keep_ratio_scale(h0, w0, scale)
        # never exceed the static canvas
        ch, cw = self.canvas
        factor = min(factor, ch / h0, cw / w0)
        nh, nw = int(h0 * factor + 0.5), int(w0 * factor + 0.5)
        img = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_LINEAR)

        boxes = ann["boxes"] * factor
        flip = train and rng.rand() < self.flip_prob
        if flip:
            img = img[:, ::-1]
            flipped = boxes.copy()
            flipped[:, 0] = nw - boxes[:, 2]
            flipped[:, 2] = nw - boxes[:, 0]
            boxes = flipped

        out_img = np.zeros((ch, cw, 3), np.float32)
        out_img[:nh, :nw] = (img.astype(np.float32) - self.mean) / self.std

        g = self.max_gt
        n = min(len(boxes), g)
        gt_boxes = np.zeros((g, 4), np.float32)
        gt_labels = np.zeros(g, np.int64)
        gt_valid = np.zeros(g, bool)
        gt_boxes[:n] = boxes[:n]
        gt_labels[:n] = ann["labels"][:n]
        gt_valid[:n] = True

        out = {
            "image": out_img,
            "gt_boxes": gt_boxes,
            "gt_labels": gt_labels,
            "gt_valid": gt_valid,
            "img_shape": np.array([nh, nw], np.int32),
            "scale_factor": np.float32(factor),
            "flip": np.bool_(flip),
        }

        if self.with_mask:
            s = self.mask_stride
            mh, mw = ch // s, cw // s
            masks = np.zeros((g, mh, mw), np.uint8)
            for i in range(n):
                segm = ann["segms"][i]
                if segm is None:
                    x1, y1, x2, y2 = boxes[i].astype(int)
                    masks[i, y1 // s:y2 // s, x1 // s:x2 // s] = 1
                    continue
                m = segm_to_bitmap(segm, ann["height"], ann["width"])
                m = cv2.resize(m, (nw, nh),
                               interpolation=cv2.INTER_NEAREST)
                if flip:
                    m = m[:, ::-1]
                if s > 1:
                    m = cv2.resize(m, (nw // s, nh // s),
                                   interpolation=cv2.INTER_NEAREST)
                masks[i, :m.shape[0], :m.shape[1]] = m
            out["gt_masks"] = masks
        return out


class DetectionLoader:
    """Batches a CocoStyleDataset through the pipeline with repeat-factor
    + aspect-group epoch ordering. Yields host numpy batch dicts."""

    def __init__(self, dataset: CocoStyleDataset, pipeline: DetectionPipeline,
                 batch_size: int, oversample_thr: float = 0.0,
                 seed: int = 0, train: bool = True, num_workers: int = 8):
        from iif_tpu.detection.datasets import (expand_indices_by_repeat,
                                                group_epoch_order,
                                                repeat_factors)

        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.seed = seed
        self.train = train
        self.epoch = 0
        # host-parallel decode+pipeline (the reference's DataLoader
        # num_workers; threads suffice — cv2 releases the GIL)
        self.num_workers = num_workers
        if train and oversample_thr > 0:
            self.base_indices = expand_indices_by_repeat(
                repeat_factors(dataset, oversample_thr))
        else:
            self.base_indices = np.arange(len(dataset))
        self._group_order = group_epoch_order

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return len(self.base_indices) // self.batch_size

    def _load_image(self, idx: int) -> np.ndarray:
        import cv2

        path = self.dataset.image_path(idx)
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def __iter__(self):
        if self.train:
            order = self._group_order(self.dataset.flag[self.base_indices]
                                      if len(self.dataset.flag) else
                                      np.zeros(len(self.base_indices), np.uint8),
                                      np.arange(len(self.base_indices)),
                                      self.epoch, self.batch_size, self.seed)
            order = self.base_indices[order]
        else:
            order = self.base_indices
        from concurrent.futures import ThreadPoolExecutor

        base_rng = np.random.RandomState(self.seed + self.epoch)

        def _one(args):
            i, sample_seed = args
            img = self._load_image(int(i))
            ann = self.dataset.get_ann(int(i))
            return self.pipeline(img, ann, np.random.RandomState(sample_seed),
                                 self.train)

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            for b0 in range(0, len(order) - self.batch_size + 1,
                            self.batch_size):
                idxs = order[b0:b0 + self.batch_size]
                seeds = base_rng.randint(0, 2 ** 31, size=len(idxs))
                samples = list(pool.map(_one, zip(idxs, seeds)))
                batch = {k: np.stack([s[k] for s in samples])
                         for k in samples[0]}
                batch["image_ids"] = np.array(
                    [self.dataset.img_infos[int(i)]["id"] for i in idxs])
                yield batch
