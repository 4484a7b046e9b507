"""Differential AP parity: DetEvaluator vs the transcribed
pycocotools/lvis-api oracle (tests/oracles/cocoeval_oracle.py) on
randomized synthetic datasets — VERDICT round-2 item 2.

Every seed generates a fresh dataset exercising the hard rules: crowd
gts (IoF + multi-match), area-range straddles, score ties, per-(img,cat)
max_dets truncation, empty-gt/empty-dt images, LVIS federated image
restriction, neg_category_ids FPs, not-exhaustive dt ignores, and the
rare/common/frequent buckets (both the image_count and the dataset
`frequency` path). Masks flow through the product RLE codec on the
evaluator side and through the oracle's independent decoder + dense IoU
on the oracle side, so the codec, rle_iou, and mask_area are all under
differential test too.
"""
import numpy as np
import pytest

from iif_tpu.detection.evaluation import DetEvaluator
from iif_tpu.detection.mask_utils import mask_area, rle_encode

from tests.oracles.cocoeval_oracle import (
    COCOEvalOracle,
    oracle_rle_decode,
)

CATS = list(range(1, 8))


def _rand_box(rng, h, w):
    """xywh box; sizes log-uniform so areas straddle 32^2 and 96^2."""
    bw = float(np.exp(rng.uniform(np.log(3), np.log(min(110, w - 1)))))
    bh = float(np.exp(rng.uniform(np.log(3), np.log(min(110, h - 1)))))
    x = float(rng.uniform(0, w - bw))
    y = float(rng.uniform(0, h - bh))
    return [x, y, bw, bh]


def _blob_mask(rng, h, w, box):
    m = np.zeros((h, w), np.uint8)
    x, y, bw, bh = (int(round(v)) for v in box)
    x, y = min(max(x, 0), w - 1), min(max(y, 0), h - 1)
    bw, bh = max(bw, 1), max(bh, 1)
    patch = (rng.rand(min(bh, h - y), min(bw, w - x)) > 0.3)
    m[y:y + patch.shape[0], x:x + patch.shape[1]] = patch
    return m


def _jitter(rng, box, h, w):
    x, y, bw, bh = box
    s = rng.uniform(0.05, 0.45)  # spans matched and unmatched IoUs
    return [min(max(x + rng.uniform(-s, s) * bw, 0), w - 2),
            min(max(y + rng.uniform(-s, s) * bh, 0), h - 2),
            max(bw * rng.uniform(1 - s, 1 + s), 1.5),
            max(bh * rng.uniform(1 - s, 1 + s), 1.5)]


def make_scenario(seed, segm, lvis):
    rng = np.random.RandomState(seed)
    n_imgs = rng.randint(7, 12)
    images, gt_anns, dets = [], [], []
    for iid in range(1, n_imgs + 1):
        h, w = int(rng.randint(64, 128)), int(rng.randint(64, 128))
        im = {"id": iid, "height": h, "width": w}
        present = set()
        n_gt = rng.randint(0, 6)
        for _ in range(n_gt):
            cat = int(rng.choice(CATS))
            box = _rand_box(rng, h, w)
            ann = {"image_id": iid, "category_id": cat,
                   "bbox": box,
                   "iscrowd": int(rng.rand() < 0.18) if not lvis else 0}
            if segm:
                dense = _blob_mask(rng, h, w, box)
                ann["segmentation"] = rle_encode(dense)
                ann["_dense_mask"] = dense
                ann["area"] = float(dense.sum())
            else:
                ann["area"] = box[2] * box[3]
            gt_anns.append(ann)
            present.add(cat)
            # detections: jittered copies (sometimes several -> crowd
            # multi-match / duplicate suppression), plus misses
            for _ in range(rng.randint(0, 3)):
                db = _jitter(rng, box, h, w)
                d = {"image_id": iid, "category_id": cat, "bbox": db,
                     "score": round(float(rng.rand()), 2)}  # ties
                if segm:
                    dm = _blob_mask(rng, h, w, db)
                    rle = rle_encode(dm)
                    d["segmentation"] = rle
                    d["area"] = mask_area(rle)
                dets.append(d)
        # false positives, including categories with no gt in the image
        for _ in range(rng.randint(0, 5)):
            cat = int(rng.choice(CATS))
            db = _rand_box(rng, h, w)
            d = {"image_id": iid, "category_id": cat, "bbox": db,
                 "score": round(float(rng.rand()), 2)}
            if segm:
                dm = _blob_mask(rng, h, w, db)
                rle = rle_encode(dm)
                d["segmentation"] = rle
                d["area"] = mask_area(rle)
            dets.append(d)
        if lvis:
            absent = [c for c in CATS if c not in present]
            rng.shuffle(absent)
            im["neg_category_ids"] = absent[:rng.randint(0, 4)]
            nel = [c for c in CATS if rng.rand() < 0.25]
            im["not_exhaustive_category_ids"] = nel
        images.append(im)
    # dt flood on one (image, category) cell so per-cell max_dets
    # truncation actively matters
    flood_src = [d for d in dets if not lvis or d["category_id"] in set(
        a["category_id"] for a in gt_anns if a["image_id"] == d["image_id"])]
    if flood_src:
        base = flood_src[rng.randint(len(flood_src))]
        h = images[base["image_id"] - 1]["height"]
        w = images[base["image_id"] - 1]["width"]
        for _ in range(14):
            db = _jitter(rng, base["bbox"], h, w)
            d = {"image_id": base["image_id"],
                 "category_id": base["category_id"], "bbox": db,
                 "score": round(float(rng.rand()), 2)}
            if segm:
                dm = _blob_mask(rng, h, w, db)
                rle = rle_encode(dm)
                d["segmentation"] = rle
                d["area"] = mask_area(rle)
            dets.append(d)
    counts = {c: int(rng.choice([3, 8, 40, 90, 150, 400]))
              for c in CATS}
    freq = None
    if lvis and seed % 2 == 0:  # exercise the dataset 'frequency' path
        freq = {c: rng.choice(["r", "c", "f"]) for c in CATS}
    return images, gt_anns, dets, counts, freq


def _both(seed, segm, lvis, max_dets):
    images, gt_anns, dets, counts, freq = make_scenario(seed, segm, lvis)
    iou_type = "segm" if segm else "bbox"
    ev = DetEvaluator(images, gt_anns, CATS, lvis=lvis,
                      cat_image_counts=counts, max_dets=max_dets,
                      cat_frequency=freq)
    got = ev.evaluate(dets, iou_type)
    oracle = COCOEvalOracle(images, gt_anns, CATS, dets,
                            iou_type=iou_type, lvis=lvis,
                            max_dets=max_dets, cat_image_counts=counts,
                            cat_frequency=freq)
    want = oracle.summarize()
    return got, want


@pytest.mark.parametrize("seed", range(24))
def test_ap_parity_randomized(seed):
    """24 randomized datasets x {coco,lvis} x {bbox,segm}; max_dets=7
    for half the seeds so per-(img,cat) truncation actively matters."""
    segm = seed % 4 in (1, 3)
    lvis = seed % 4 in (2, 3)
    max_dets = 7 if seed % 2 else (300 if lvis else 100)
    got, want = _both(seed, segm, lvis, max_dets)
    assert set(want) <= set(got)
    for k, v in want.items():
        np.testing.assert_allclose(
            got[k], v, atol=1e-7, err_msg=f"metric {k} seed {seed}",
            equal_nan=True)


def test_ap_parity_no_detections():
    images, gt_anns, _, counts, _ = make_scenario(99, False, False)
    got, want = ( DetEvaluator(images, gt_anns, CATS,
                               cat_image_counts=counts).evaluate([]),
                  COCOEvalOracle(images, gt_anns, CATS, [],
                                 cat_image_counts=counts).summarize())
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, atol=1e-7, equal_nan=True)


def test_ap_parity_empty_category():
    """A category with zero gts anywhere but some detections must be
    excluded from the mean identically (-1 precision convention)."""
    images, gt_anns, dets, counts, _ = make_scenario(7, False, False)
    gt_anns = [g for g in gt_anns if g["category_id"] != 3]
    got, want = (
        DetEvaluator(images, gt_anns, CATS,
                     cat_image_counts=counts).evaluate(dets),
        COCOEvalOracle(images, gt_anns, CATS, dets,
                       cat_image_counts=counts).summarize())
    for k, v in want.items():
        np.testing.assert_allclose(got[k], v, atol=1e-7, equal_nan=True)


@pytest.mark.parametrize("seed", range(6))
def test_rle_codec_vs_independent_decoder(seed):
    """Product rle_encode round-trips through the oracle's independent
    decoder, and mask_area agrees with the dense sum."""
    rng = np.random.RandomState(seed)
    h, w = int(rng.randint(1, 90)), int(rng.randint(1, 90))
    dense = (rng.rand(h, w) > rng.uniform(0.05, 0.95)).astype(np.uint8)
    rle = rle_encode(dense)
    np.testing.assert_array_equal(oracle_rle_decode(rle), dense)
    assert mask_area(rle) == int(dense.sum())
