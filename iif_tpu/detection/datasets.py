"""COCO / LVIS detection datasets — pure-json, no pycocotools.

Rebuild of ``mmdet/datasets/coco.py`` (ann loading + filtering) and
``mmdet/datasets/lvis.py`` (LVIS v0.5/v1 specifics: ``neg_category_ids``,
``not_exhaustive_category_ids``, image urls carrying file names), plus the
``ClassBalancedDataset`` repeat-factor wrapper
(``dataset_wrappers.py:175-287``) and the aspect-ratio ``GroupSampler``
(``samplers/group_sampler.py``) expressed as a deterministic epoch-order
function.
"""
from __future__ import annotations

import json
import math
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from iif_tpu.registry import DATASETS


class CocoStyleDataset:
    """Annotation container for COCO-format json (incl. LVIS).

    Exposes per-image records ``{file_name, width, height, ann}`` where
    ``ann`` carries padded-ready numpy arrays (boxes xyxy, labels as
    contiguous 0..C-1 ids, segmentation objects).
    """

    def __init__(self, ann_file: str, img_prefix: str = "",
                 filter_empty_gt: bool = True, min_size: int = 32,
                 lvis_style: bool = False,
                 proposal_file: Optional[str] = None):
        self.img_prefix = img_prefix
        self.lvis_style = lvis_style
        with open(ann_file) as f:
            data = json.load(f)

        cats = sorted(data["categories"], key=lambda c: c["id"])
        self.cat_ids = [c["id"] for c in cats]
        self.CLASSES = [c["name"] for c in cats]
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        # per-category image counts (drives IIF weights + repeat factors)
        self.cat_image_counts = {c["id"]: c.get("image_count", 0)
                                 for c in cats}
        # LVIS v1 ships a per-category 'frequency' field ('r'/'c'/'f');
        # the evaluator prefers it over recomputed buckets
        self.cat_frequency = {c["id"]: c.get("frequency") for c in cats}

        anns_by_img: Dict[int, List[dict]] = defaultdict(list)
        for a in data.get("annotations", []):
            anns_by_img[a["image_id"]].append(a)

        # image-corpus size BEFORE empty-gt filtering: the N of the
        # detection IIF weights (idf_1204.csv encodes N=100170 = the full
        # LVIS v1 train image list)
        self.num_images_total = len(data["images"])

        # precomputed proposals for RPN-free training/eval (FastRCNN;
        # reference CustomDataset(proposal_file=...) + LoadProposals,
        # mmdet/datasets/custom.py + pipelines/loading.py): a pickle/npy
        # list of per-image (n, 4|5) float arrays aligned with the json's
        # image order, carried through filtering on the record itself
        proposal_list = None
        if proposal_file is not None:
            proposal_list = self._load_proposals(proposal_file)
            if len(proposal_list) != len(data["images"]):
                raise ValueError(
                    f"proposal_file has {len(proposal_list)} entries for "
                    f"{len(data['images'])} images")

        self.img_infos: List[dict] = []
        for img in data["images"]:
            file_name = img.get("file_name")
            if file_name is None and "coco_url" in img:  # LVIS v1
                file_name = img["coco_url"].replace(
                    "http://images.cocodataset.org/", "")
            rec = {
                "id": img["id"],
                "file_name": file_name,
                "width": img["width"],
                "height": img["height"],
                "neg_category_ids": img.get("neg_category_ids", []),
                "not_exhaustive_category_ids":
                    img.get("not_exhaustive_category_ids", []),
                "anns": anns_by_img.get(img["id"], []),
            }
            if proposal_list is not None:
                rec["proposals"] = proposal_list[len(self.img_infos)]
            self.img_infos.append(rec)
        self.with_proposals = proposal_list is not None

        if filter_empty_gt:
            self.img_infos = [
                r for r in self.img_infos
                if any(not a.get("iscrowd", 0) for a in r["anns"])
                and min(r["width"], r["height"]) >= min_size]

        self.flag = np.array(
            [1 if r["width"] / r["height"] > 1 else 0
             for r in self.img_infos], np.uint8)

    def __len__(self) -> int:
        return len(self.img_infos)

    @staticmethod
    def _load_proposals(path: str) -> List[np.ndarray]:
        """Load a per-image proposal list (.pkl of arrays — the mmdet
        convention — or a .npy object array); entries normalized to
        float32 (n, 4|5)."""
        if path.endswith(".npy"):
            raw = list(np.load(path, allow_pickle=True))
        else:
            import pickle

            with open(path, "rb") as f:
                raw = pickle.load(f)
        out = []
        for p in raw:
            p = np.asarray(p, np.float32)
            if p.ndim != 2 or p.shape[-1] not in (4, 5):
                raise ValueError(
                    f"proposal entries must be (n, 4|5); got {p.shape}")
            out.append(p)
        return out

    def get_proposals(self, idx: int) -> Optional[np.ndarray]:
        """Precomputed proposals (n, 4|5) for image ``idx`` (None when no
        proposal_file was configured)."""
        return self.img_infos[idx].get("proposals")

    def get_ann(self, idx: int) -> Dict:
        """Parsed annotations (``coco.py:38-96`` _parse_ann_info)."""
        rec = self.img_infos[idx]
        w, h = rec["width"], rec["height"]
        boxes, labels, segms = [], [], []
        crowd_boxes, crowd_labels = [], []
        for a in rec["anns"]:
            x, y, bw, bh = a["bbox"]
            x1, y1 = max(x, 0), max(y, 0)
            x2, y2 = min(x + bw, w), min(y + bh, h)
            if a.get("area", bw * bh) <= 0 or x2 <= x1 or y2 <= y1:
                continue
            if a.get("category_id") not in self.cat2label:
                continue
            if a.get("iscrowd", 0):
                crowd_boxes.append([x1, y1, x2, y2])
                crowd_labels.append(self.cat2label[a["category_id"]])
                continue
            boxes.append([x1, y1, x2, y2])
            labels.append(self.cat2label[a["category_id"]])
            segms.append(a.get("segmentation"))
        return {
            "boxes": np.asarray(boxes, np.float32).reshape(-1, 4),
            "labels": np.asarray(labels, np.int64),
            "segms": segms,
            "crowd_boxes": np.asarray(crowd_boxes, np.float32).reshape(-1, 4),
            "crowd_labels": np.asarray(crowd_labels, np.int64),
            "width": w,
            "height": h,
        }

    def image_path(self, idx: int) -> str:
        return os.path.join(self.img_prefix, self.img_infos[idx]["file_name"])

    def class_image_counts(self) -> np.ndarray:
        """Per-class image counts: from LVIS ``image_count`` metadata when
        present, else counted from annotations."""
        counts = np.zeros(len(self.CLASSES), np.int64)
        meta = [self.cat_image_counts.get(cid, 0) for cid in self.cat_ids]
        if any(meta):
            return np.asarray(meta, np.int64)
        for rec in self.img_infos:
            seen = {self.cat2label[a["category_id"]] for a in rec["anns"]
                    if a.get("category_id") in self.cat2label}
            for l in seen:
                counts[l] += 1
        return counts

    def class_instance_counts(self) -> np.ndarray:
        """Per-class instance counts from the annotations (drives the
        ``*_obj`` IIF variants and FASA's initial sampling probs)."""
        counts = np.zeros(len(self.CLASSES), np.int64)
        for rec in self.img_infos:
            for a in rec["anns"]:
                cid = a.get("category_id")
                if cid in self.cat2label and not a.get("iscrowd", 0):
                    counts[self.cat2label[cid]] += 1
        return counts


DATASETS.register(name="CocoDataset", module=CocoStyleDataset)


VOC_CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
               "car", "cat", "chair", "cow", "diningtable", "dog",
               "horse", "motorbike", "person", "pottedplant", "sheep",
               "sofa", "train", "tvmonitor")


@DATASETS.register(name="VOCDataset")
class VOCDataset(CocoStyleDataset):
    """Pascal-VOC XML annotations (reference
    ``mmdet/datasets/xml_style.py`` + ``voc.py``; configs/pascal_voc):
    ``ann_file`` is an ImageSets split txt of image ids under
    ``img_prefix`` (a VOCdevkit/VOC20xx directory). Parsed into the
    same in-memory coco-style records as CocoStyleDataset, so the
    pipeline/loader/evaluator run unchanged: boxes go 1-based -> 0-based
    (xml_style.py:141), ``difficult`` objects become ignore regions
    (crowd semantics, :131), images without any non-difficult object
    are dropped when ``filter_empty_gt``."""

    use_folder_tag = False

    def __init__(self, ann_file: str, img_prefix: str = "",
                 filter_empty_gt: bool = True, min_size: int = 32,
                 classes=None, img_subdir: str = "JPEGImages",
                 ann_subdir: str = "Annotations"):
        import xml.etree.ElementTree as ET

        self.img_prefix = img_prefix
        self.lvis_style = False
        self.CLASSES = list(classes or VOC_CLASSES)
        self.cat_ids = list(range(1, len(self.CLASSES) + 1))
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        name2cid = {n: cid for n, cid in zip(self.CLASSES, self.cat_ids)}
        self.cat_image_counts = {cid: 0 for cid in self.cat_ids}
        self.cat_frequency = {cid: None for cid in self.cat_ids}

        with open(ann_file) as f:
            ids = [line.strip() for line in f if line.strip()]
        self.num_images_total = len(ids)

        self.img_infos = []
        ann_id = 0
        for k, img_id in enumerate(ids):
            xml_path = os.path.join(img_prefix, ann_subdir,
                                    f"{img_id}.xml")
            root = ET.parse(xml_path).getroot()
            size = root.find("size")
            w = int(size.find("width").text)
            h = int(size.find("height").text)
            anns = []
            for obj in root.findall("object"):
                name = obj.find("name").text
                if name not in name2cid:
                    continue
                diff = obj.find("difficult")
                diff = 0 if diff is None else int(diff.text)
                bb = obj.find("bndbox")
                x1 = float(bb.find("xmin").text) - 1
                y1 = float(bb.find("ymin").text) - 1
                x2 = float(bb.find("xmax").text) - 1
                y2 = float(bb.find("ymax").text) - 1
                bw, bh = x2 - x1, y2 - y1
                # xml_style.py:131 ignores only `difficult` objects
                # (its min_size box-ignore defaults to None/off)
                ignore = diff
                ann_id += 1
                anns.append({"id": ann_id,
                             "category_id": name2cid[name],
                             "bbox": [x1, y1, bw, bh],
                             "area": bw * bh,
                             "iscrowd": int(bool(ignore)),
                             "segmentation": None})
            obj_fname = root.find("filename")
            fname = (obj_fname.text if obj_fname is not None
                     else f"{img_id}.jpg")
            folder = root.find("folder")
            if self.use_folder_tag and folder is not None:
                # WIDER-Face xmls name the per-event folder
                # (wider_face.py:36-42)
                fname = os.path.join(folder.text, fname)
            self.img_infos.append({
                "id": k + 1,
                "file_name": os.path.join(img_subdir, fname),
                "width": w, "height": h,
                "neg_category_ids": [],
                "not_exhaustive_category_ids": [],
                "anns": anns,
            })

        if filter_empty_gt:
            self.img_infos = [
                r for r in self.img_infos
                if any(not a["iscrowd"] for a in r["anns"])
                and min(r["width"], r["height"]) >= min_size]
        self.flag = np.array(
            [1 if r["width"] / r["height"] > 1 else 0
             for r in self.img_infos], np.uint8)


@DATASETS.register(name="WIDERFaceDataset")
class WIDERFaceDataset(VOCDataset):
    """WIDER-Face in its mmdet XML packaging (reference
    ``mmdet/datasets/wider_face.py``; configs/wider_face): one 'face'
    class, images under per-event folders named in the xml
    ``folder`` tag."""

    use_folder_tag = True

    def __init__(self, ann_file: str, img_prefix: str = "", **kw):
        kw.setdefault("classes", ("face",))
        kw.setdefault("img_subdir", "WIDER_train/images")
        super().__init__(ann_file, img_prefix, **kw)


@DATASETS.register(name="LVISV1Dataset")
class LVISV1Dataset(CocoStyleDataset):
    def __init__(self, ann_file: str, img_prefix: str = "", **kw):
        super().__init__(ann_file, img_prefix, lvis_style=True, **kw)


@DATASETS.register(name="CityscapesDataset")
class CityscapesDataset(CocoStyleDataset):
    """Cityscapes instance segmentation via its instancesonly COCO json
    (reference ``mmdet/datasets/cityscapes.py``: 8 instance classes,
    all-crowd images filtered — the base filter already requires a
    non-crowd annotation). Produce the json from raw gtFine with
    ``python -m iif_tpu.cli.convert cityscapes``."""

    CITYSCAPES_CLASSES = ("person", "rider", "car", "truck", "bus",
                          "train", "motorcycle", "bicycle")

    def __init__(self, ann_file: str, img_prefix: str = "", **kw):
        super().__init__(ann_file, img_prefix, **kw)
        if tuple(self.CLASSES) != self.CITYSCAPES_CLASSES:
            raise ValueError(
                "not a cityscapes instancesonly json: categories "
                f"{self.CLASSES}")


@DATASETS.register(name="DeepFashionDataset")
class DeepFashionDataset(CocoStyleDataset):
    """DeepFashion landmark/clothes detection in COCO packaging
    (reference ``mmdet/datasets/deepfashion.py`` — a CocoDataset with a
    fixed 15-class roster; classes come from the json categories)."""


class ConcatDataset:
    """``mmdet.datasets.dataset_wrappers.ConcatDataset`` equivalent: chain
    several CocoStyle datasets (shared class set)."""

    def __init__(self, datasets: Sequence[CocoStyleDataset]):
        self.datasets = list(datasets)
        self.CLASSES = self.datasets[0].CLASSES
        self.cat_ids = self.datasets[0].cat_ids
        self.cat2label = self.datasets[0].cat2label
        self.lvis_style = getattr(self.datasets[0], "lvis_style", False)
        self.cat_image_counts = self.datasets[0].cat_image_counts
        self.cat_frequency = getattr(self.datasets[0], "cat_frequency", {})
        self.num_images_total = sum(
            getattr(d, "num_images_total", len(d)) for d in self.datasets)
        self._lens = np.array([len(d) for d in self.datasets])
        self._cum = np.concatenate([[0], np.cumsum(self._lens)])
        self.img_infos = [r for d in self.datasets for r in d.img_infos]
        self.flag = np.concatenate([d.flag for d in self.datasets]) \
            if all(len(d.flag) for d in self.datasets) else np.array([])

    def __len__(self) -> int:
        return int(self._lens.sum())

    def _locate(self, idx: int):
        di = int(np.searchsorted(self._cum, idx, side="right") - 1)
        return self.datasets[di], idx - int(self._cum[di])

    def get_ann(self, idx: int) -> Dict:
        d, i = self._locate(idx)
        return d.get_ann(i)

    def image_path(self, idx: int) -> str:
        d, i = self._locate(idx)
        return d.image_path(i)

    def class_image_counts(self) -> np.ndarray:
        return sum(d.class_image_counts() for d in self.datasets)

    def class_instance_counts(self) -> np.ndarray:
        return sum(d.class_instance_counts() for d in self.datasets)


class RepeatDataset(ConcatDataset):
    """``RepeatDataset`` equivalent: the same dataset ``times`` times."""

    def __init__(self, dataset: CocoStyleDataset, times: int):
        super().__init__([dataset] * times)


def repeat_factors(dataset: CocoStyleDataset, oversample_thr: float
                   ) -> np.ndarray:
    """LVIS repeat-factor sampling (``ClassBalancedDataset``,
    ``dataset_wrappers.py:230-276``): category factor
    ``r(c) = max(1, sqrt(t / f(c)))`` with f(c) the fraction of images
    containing c; image factor ``r(I) = max_{c in I} r(c)``."""
    n = len(dataset)
    cat_freq: Dict[int, float] = defaultdict(float)
    img_cats: List[set] = []
    for rec in dataset.img_infos:
        cats = {a["category_id"] for a in rec["anns"]
                if a.get("category_id") in dataset.cat2label}
        img_cats.append(cats)
        for c in cats:
            cat_freq[c] += 1
    for c in cat_freq:
        cat_freq[c] /= n
    cat_repeat = {
        c: max(1.0, math.sqrt(oversample_thr / f)) for c, f in cat_freq.items()
    }
    out = np.ones(n)
    for i, cats in enumerate(img_cats):
        if cats:
            out[i] = max(cat_repeat[c] for c in cats)
    return out


def expand_indices_by_repeat(factors: np.ndarray) -> np.ndarray:
    """Stochastic-free expansion used by mmdet: ceil() the factors."""
    out = []
    for i, f in enumerate(factors):
        out.extend([i] * int(math.ceil(f)))
    return np.asarray(out, np.int64)


def group_epoch_order(flags: np.ndarray, indices: np.ndarray, epoch: int,
                      samples_per_gpu: int, seed: int = 0) -> np.ndarray:
    """Aspect-ratio-homogeneous batch order (``GroupSampler`` /
    ``DistributedGroupSampler``): shuffle within each aspect group, chunk
    into GPU-batches, shuffle the chunks."""
    rng = np.random.RandomState(seed + epoch)
    chunks = []
    for g in np.unique(flags[indices]):
        members = indices[flags[indices] == g]
        rng.shuffle(members)
        pad = (-len(members)) % samples_per_gpu
        if pad:  # wrap-around padding (group may be smaller than a batch)
            members = np.concatenate(
                [members, np.resize(members, pad)])
        chunks.extend(members.reshape(-1, samples_per_gpu))
    order = np.arange(len(chunks))
    rng.shuffle(order)
    return np.concatenate([chunks[i] for i in order]) if chunks else indices
