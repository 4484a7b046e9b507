"""COCO panoptic dataset + Panoptic Quality (PQ) evaluation.

TPU-native parity for the reference's ``mmdet/datasets/coco_panoptic.py``
(CocoPanopticDataset: panoptic json + id-encoded PNGs; evaluate() runs
panopticapi's pq_compute). The PQ metric here is an original numpy
implementation of the published definition (Kirillov et al., "Panoptic
Segmentation": PQ = sum IoU(TP) / (|TP| + 0.5 |FP| + 0.5 |FN|), segments
match at IoU > 0.5, crowd/void carve-outs) — no panopticapi dependency.

Label/encoding conventions (shared with ``panoptic.heuristic_fuse``):
- contiguous categories: things [0, num_things), stuff
  [num_things, num_things + num_stuff)
- panoptic id maps: thing pixel = ``label + inst_id * 1000`` (inst_id
  >= 1), stuff pixel = ``label``, void = ``-1``.
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from iif_tpu.registry import DATASETS

VOID = -1
INSTANCE_OFFSET = 1000


def rgb2id(color: np.ndarray) -> np.ndarray:
    """Panoptic-COCO PNG encoding: id = R + 256 G + 256^2 B."""
    color = color.astype(np.int64)
    return color[..., 0] + 256 * color[..., 1] + 256 * 256 * color[..., 2]


def id2rgb(ids: np.ndarray) -> np.ndarray:
    ids = ids.astype(np.int64)
    return np.stack([ids % 256, (ids // 256) % 256,
                     (ids // 65536) % 256], -1).astype(np.uint8)


def category_of(region_id: int, num_things: int) -> int:
    """Contiguous category of a fused-map region id (see module doc)."""
    return region_id % INSTANCE_OFFSET if region_id >= INSTANCE_OFFSET \
        else region_id


def pan_to_segments(pan: np.ndarray, num_things: int
                    ) -> Dict[int, Dict[str, int]]:
    """Region table of a fused panoptic map: id -> {category_id, area}."""
    ids, counts = np.unique(pan, return_counts=True)
    return {int(i): {"category_id": category_of(int(i), num_things),
                     "area": int(c), "iscrowd": 0}
            for i, c in zip(ids, counts) if i != VOID}


def pq_single(gt_pan: np.ndarray, gt_segments: Dict[int, Dict],
              pred_pan: np.ndarray, pred_segments: Dict[int, Dict],
              ) -> Dict[int, np.ndarray]:
    """Per-image PQ statistics.

    Segment tables map region id -> {category_id, area, iscrowd}; ids in
    the table must cover the non-void ids in the map. Returns
    {category: [iou_sum, tp, fp, fn]} accumulators.
    """
    stats: Dict[int, np.ndarray] = defaultdict(lambda: np.zeros(4))
    # joint intersection histogram; shift ids +1 so VOID keys as 0
    pair = ((gt_pan.astype(np.int64) + 1) << 32) \
        | (pred_pan.astype(np.int64) + 1)
    keys, counts = np.unique(pair, return_counts=True)
    inter = {(int(k >> 32) - 1, int(k & 0xFFFFFFFF) - 1): int(c)
             for k, c in zip(keys, counts)}

    gt_matched, pred_matched = set(), set()
    for (g, p), n in inter.items():
        if g not in gt_segments or p not in pred_segments:
            continue
        gi, pi = gt_segments[g], pred_segments[p]
        if gi.get("iscrowd", 0):
            continue
        if gi["category_id"] != pi["category_id"]:
            continue
        # pred pixels lying on gt-void don't count against the union
        union = (pi["area"] + gi["area"] - n - inter.get((VOID, p), 0))
        iou = n / union
        if iou > 0.5:
            s = stats[gi["category_id"]]
            s[0] += iou
            s[1] += 1
            gt_matched.add(g)
            pred_matched.add(p)

    crowd_by_cat: Dict[int, int] = {}
    for g, gi in gt_segments.items():
        if g in gt_matched:
            continue
        if gi.get("iscrowd", 0):
            crowd_by_cat[gi["category_id"]] = g
            continue
        stats[gi["category_id"]][3] += 1            # FN
    for p, pi in pred_segments.items():
        if p in pred_matched:
            continue
        # mostly-void or mostly-crowd-of-same-class predictions are
        # neither right nor wrong
        covered = inter.get((VOID, p), 0)
        if pi["category_id"] in crowd_by_cat:
            covered += inter.get((crowd_by_cat[pi["category_id"]], p), 0)
        if covered / pi["area"] > 0.5:
            continue
        stats[pi["category_id"]][2] += 1            # FP
    return stats


def pq_aggregate(stats_list: Sequence[Dict[int, np.ndarray]],
                 num_things: int, num_classes: int,
                 class_names: Optional[Sequence[str]] = None
                 ) -> Dict[str, float]:
    """Merge per-image stats into PQ/SQ/RQ overall + Things/Stuff splits
    (the reference prints PQ, PQ_th, PQ_st ×100, coco_panoptic.py:496)."""
    total = defaultdict(lambda: np.zeros(4))
    for st in stats_list:
        for c, v in st.items():
            total[c] += v

    def _avg(cats: Sequence[int]) -> Tuple[float, float, float, int]:
        pq = sq = rq = 0.0
        n = 0
        for c in cats:
            iou, tp, fp, fn = total.get(c, np.zeros(4))
            if tp + fp + fn == 0:
                continue
            n += 1
            denom = tp + 0.5 * fp + 0.5 * fn
            pq += iou / denom
            sq += iou / tp if tp else 0.0
            rq += tp / denom
        if n == 0:
            return 0.0, 0.0, 0.0, 0
        return pq / n, sq / n, rq / n, n

    things = list(range(num_things))
    stuff = list(range(num_things, num_classes))
    out: Dict[str, float] = {}
    for name, cats in (("", things + stuff), ("_th", things),
                       ("_st", stuff)):
        pq, sq, rq, n = _avg(cats)
        out[f"PQ{name}"] = 100.0 * pq
        out[f"SQ{name}"] = 100.0 * sq
        out[f"RQ{name}"] = 100.0 * rq
    if class_names is not None:
        for c, name in enumerate(class_names):
            iou, tp, fp, fn = total.get(c, np.zeros(4))
            if tp + fp + fn:
                out[f"PQ_{name}"] = \
                    100.0 * iou / (tp + 0.5 * fp + 0.5 * fn)
    return out


@DATASETS.register(name="CocoPanopticDataset")
class CocoPanopticDataset:
    """COCO panoptic-format annotations (reference
    ``coco_panoptic.py:120``: one annotation per image with
    ``segments_info`` + an id-encoded PNG next to the json).

    Duck-types the CocoStyleDataset protocol so the detection loader/
    pipeline/trainer run unchanged: thing segments become instance
    boxes/labels/RLE masks, and ``semantic_map`` provides the
    PanopticFPN stuff-branch target.
    """

    def __init__(self, ann_file: str, img_prefix: str = "",
                 seg_prefix: Optional[str] = None,
                 filter_empty_gt: bool = True, min_size: int = 32):
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix or os.path.splitext(ann_file)[0]
        with open(ann_file) as f:
            data = json.load(f)

        cats = sorted(data["categories"], key=lambda c: c["id"])
        # contiguous labels: things first, then stuff (reference CLASSES
        # ordering, coco_panoptic.py:150-205)
        things = [c for c in cats if c.get("isthing", 1)]
        stuff = [c for c in cats if not c.get("isthing", 1)]
        self.num_things = len(things)
        self.num_stuff = len(stuff)
        self.cat_ids = [c["id"] for c in things + stuff]
        self.CLASSES = [c["name"] for c in things + stuff]
        self.THING_CLASSES = [c["name"] for c in things]
        self.STUFF_CLASSES = [c["name"] for c in stuff]
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}

        ann_by_img = {a["image_id"]: a for a in data.get("annotations", [])}
        self.num_images_total = len(data["images"])
        self.img_infos: List[dict] = []
        for img in data["images"]:
            a = ann_by_img.get(img["id"], {})
            rec = {"id": img["id"], "file_name": img["file_name"],
                   "width": img["width"], "height": img["height"],
                   "segm_file": a.get("file_name"),
                   "segments_info": a.get("segments_info", []),
                   "neg_category_ids": [],
                   "not_exhaustive_category_ids": []}
            self.img_infos.append(rec)
        if filter_empty_gt:
            self.img_infos = [
                r for r in self.img_infos
                if any(s["category_id"] in self.cat2label
                       and self.cat2label[s["category_id"]]
                       < self.num_things and not s.get("iscrowd", 0)
                       for s in r["segments_info"])
                and min(r["width"], r["height"]) >= min_size]
        self.flag = np.array([1 if r["width"] / r["height"] > 1 else 0
                              for r in self.img_infos], np.uint8)
        # CocoStyleDataset protocol attrs consumed by the CLIs
        self.lvis_style = False
        self.cat_image_counts: Dict[int, int] = {}
        self.cat_frequency: Dict[int, Optional[str]] = {}

    # ------------------------------------------------- dataset protocol
    def __len__(self) -> int:
        return len(self.img_infos)

    def image_path(self, idx: int) -> str:
        return os.path.join(self.img_prefix,
                            self.img_infos[idx]["file_name"])

    def _load_pan_ids(self, idx: int) -> np.ndarray:
        import cv2

        path = os.path.join(self.seg_prefix,
                            self.img_infos[idx]["segm_file"])
        png = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
        return rgb2id(png)

    def get_ann(self, idx: int) -> Dict:
        """Thing segments -> instance annotations (masks as RLE via the
        in-repo codec; reference _parse_ann_info keeps thing segments as
        gt and crowd ones as ignore)."""
        from iif_tpu.detection.mask_utils import rle_encode

        rec = self.img_infos[idx]
        pan = self._load_pan_ids(idx)
        boxes, labels, segms, crowd = [], [], [], []
        for s in rec["segments_info"]:
            label = self.cat2label.get(s["category_id"])
            if label is None or label >= self.num_things:
                continue
            x, y, w, h = s["bbox"]
            box = [max(x, 0), max(y, 0),
                   min(x + w, rec["width"]), min(y + h, rec["height"])]
            if box[2] <= box[0] or box[3] <= box[1]:
                continue
            if s.get("iscrowd", 0):
                crowd.append(box)
                continue
            boxes.append(box)
            labels.append(label)
            segms.append(rle_encode(pan == s["id"]))
        return {"boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
                "labels": np.asarray(labels, np.int64),
                "segms": segms,
                "crowd_boxes": np.asarray(crowd, np.float32).reshape(-1, 4),
                "width": rec["width"], "height": rec["height"],
                "semantic_seg": self._semantic_from(rec, pan)}

    def _semantic_from(self, rec: Dict, pan: np.ndarray) -> np.ndarray:
        sem = np.full(pan.shape, 255, np.uint8)
        for s in rec["segments_info"]:
            label = self.cat2label.get(s["category_id"])
            if label is not None:
                sem[pan == s["id"]] = label
        return sem

    def semantic_map(self, idx: int) -> np.ndarray:
        """(H, W) contiguous-label semantic target (void = 255, the
        reference's ignore id before ``set_things_to_void``)."""
        return self._semantic_from(self.img_infos[idx],
                                   self._load_pan_ids(idx)).astype(np.int32)

    def class_image_counts(self) -> np.ndarray:
        counts = np.zeros(len(self.CLASSES), np.int64)
        for rec in self.img_infos:
            seen = {self.cat2label[s["category_id"]]
                    for s in rec["segments_info"]
                    if s["category_id"] in self.cat2label}
            for l in seen:
                counts[l] += 1
        return counts

    def class_instance_counts(self) -> np.ndarray:
        counts = np.zeros(len(self.CLASSES), np.int64)
        for rec in self.img_infos:
            for s in rec["segments_info"]:
                l = self.cat2label.get(s["category_id"])
                if l is not None and not s.get("iscrowd", 0):
                    counts[l] += 1
        return counts

    # -------------------------------------------------------- evaluation
    def gt_pan_contiguous(self, idx: int
                          ) -> Tuple[np.ndarray, Dict[int, Dict]]:
        """GT panoptic map re-encoded into the fused-map convention +
        its segment table."""
        rec = self.img_infos[idx]
        pan = self._load_pan_ids(idx)
        out = np.full(pan.shape, VOID, np.int64)
        segments: Dict[int, Dict] = {}
        thing_counter: Dict[int, int] = defaultdict(int)
        for s in rec["segments_info"]:
            label = self.cat2label.get(s["category_id"])
            if label is None:
                continue
            m = pan == s["id"]
            area = int(m.sum())
            if area == 0:
                continue
            if label < self.num_things:
                thing_counter[label] += 1
                rid = label + thing_counter[label] * INSTANCE_OFFSET
            else:
                rid = label
            out[m] = rid
            segments[rid] = {"category_id": label, "area": area,
                             "iscrowd": int(s.get("iscrowd", 0))}
        return out, segments

    def evaluate(self, results: Sequence[Dict]) -> Dict[str, float]:
        """PQ over fused panoptic maps. ``results``: [{image_id,
        pan: (H, W) int map in the fused convention}]. The reference
        path is results2json -> panopticapi pq_compute
        (coco_panoptic.py:394-494)."""
        id2idx = {r["id"]: i for i, r in enumerate(self.img_infos)}
        stats = []
        for res in results:
            idx = id2idx[res["image_id"]]
            gt_pan, gt_segs = self.gt_pan_contiguous(idx)
            pred = np.asarray(res["pan"])
            if pred.shape != gt_pan.shape:
                raise ValueError(
                    f"pred pan {pred.shape} != gt {gt_pan.shape}")
            stats.append(pq_single(
                gt_pan, gt_segs, pred,
                pan_to_segments(pred, self.num_things)))
        return pq_aggregate(stats, self.num_things, len(self.CLASSES))
