"""Golden-semantics tests for the from-scratch COCO/LVIS evaluator.

pycocotools / lvis-api are not installable in this container, so parity is
asserted against HAND-COMPUTED expected values derived from the published
matcher rules (pycocotools cocoeval.py evaluateImg/accumulate, lvis-api
eval.py): greedy score-ordered matching, crowd-only repeat matching,
closed area intervals, not-exhaustive detection ignoring, 101-point AP.
Each test states the derivation so a reviewer can re-check by hand.
"""
import numpy as np
import pytest

from iif_tpu.detection.evaluation import (
    AREA_RANGES,
    IOU_THRS,
    DetEvaluator,
    _accumulate,
    _evaluate_img_cat,
)


def _box(x, y, w, h):
    return [float(x), float(y), float(w), float(h)]


def _gt(bbox, crowd=0, area=None):
    g = {"bbox": bbox, "iscrowd": crowd}
    g["area"] = area if area is not None else bbox[2] * bbox[3]
    return g


def _dt(bbox, score):
    return {"bbox": bbox, "score": score}


ALL = AREA_RANGES["all"]


def test_perfect_match_single():
    r = _evaluate_img_cat([_dt(_box(0, 0, 10, 10), 0.9)],
                          [_gt(_box(0, 0, 10, 10))], "bbox", ALL, 100)
    assert r.dt_matched.all()          # IoU 1.0 >= every threshold
    assert not r.dt_ignore.any()
    assert r.n_gt == 1


def test_each_gt_matched_once_highest_score_wins():
    """Two identical dts on one gt: the higher-scoring one matches, the
    other becomes an unmatched FP (pycocotools takes dts in score order
    and a non-crowd gt only once)."""
    dts = [_dt(_box(0, 0, 10, 10), 0.9), _dt(_box(0, 0, 10, 10), 0.8)]
    r = _evaluate_img_cat(dts, [_gt(_box(0, 0, 10, 10))], "bbox", ALL, 100)
    assert r.dt_matched[:, 0].all()
    assert not r.dt_matched[:, 1].any()
    assert not r.dt_ignore[:, 1].any()   # counted as FP, not ignored


def test_crowd_gt_absorbs_multiple_detections():
    """Crowd gts may be matched repeatedly; matches to them are IGNORED
    (neither TP nor FP)."""
    crowd = _gt(_box(0, 0, 20, 20), crowd=1)
    dts = [_dt(_box(0, 0, 20, 20), 0.9), _dt(_box(1, 1, 19, 19), 0.8)]
    r = _evaluate_img_cat(dts, [crowd], "bbox", ALL, 100)
    # both dts hit the crowd via IoF=1.0 / high IoF -> ignored at iou .5
    assert r.dt_ignore[0].all()
    assert r.dt_ignore[0, 1] or r.dt_matched[0, 1] == False  # noqa: E712
    assert r.n_gt == 0


def test_area_ignored_gt_taken_once_then_fp():
    """An out-of-range NON-crowd gt is 'ignore' but may be matched only
    once (pycocotools g_taken applies to all non-crowd gts). The second
    dt on it must be an ordinary FP, not ignored."""
    small_rng = AREA_RANGES["small"]
    big_gt = _gt(_box(0, 0, 100, 100))      # area 10000 > 32^2 -> ignored
    dts = [_dt(_box(0, 0, 100, 100), 0.9), _dt(_box(0, 0, 100, 100), 0.8)]
    r = _evaluate_img_cat(dts, [big_gt], "bbox", small_rng, 100)
    assert r.dt_ignore[0, 0]            # first dt matches the ignored gt
    assert not r.dt_matched[0, 0]
    # second dt cannot re-match it; unmatched + its own area out of range
    # -> area-ignored (pycocotools also ignores it: dt area 10000 > 1024)
    assert r.dt_ignore[0, 1]
    # now with an IN-range second detection: it must count as FP
    dts2 = [_dt(_box(0, 0, 100, 100), 0.9), _dt(_box(0, 0, 5, 5), 0.8)]
    r2 = _evaluate_img_cat(dts2, [big_gt], "bbox", small_rng, 100)
    assert not r2.dt_matched[0, 1] and not r2.dt_ignore[0, 1]


def test_closed_area_interval_boundary():
    """pycocotools uses a < rng[0] or a > rng[1]: area exactly 32^2 is
    inside BOTH 'small' and 'medium'."""
    gt_boundary = _gt(_box(0, 0, 32, 32))   # area 1024 == 32**2
    dt = _dt(_box(0, 0, 32, 32), 0.9)
    for rng_name in ("small", "medium"):
        r = _evaluate_img_cat([dt], [gt_boundary], "bbox",
                              AREA_RANGES[rng_name], 100)
        assert r.n_gt == 1, rng_name
        assert r.dt_matched[0, 0], rng_name


def test_not_exhaustive_ignores_unmatched_dts():
    """LVIS: unmatched dts on a not-exhaustively-annotated (img, cat) are
    ignored instead of FPs (lvis-api dt_ig_mask)."""
    gt = _gt(_box(0, 0, 10, 10))
    dts = [_dt(_box(0, 0, 10, 10), 0.9), _dt(_box(50, 50, 10, 10), 0.8)]
    r = _evaluate_img_cat(dts, [gt], "bbox", ALL, 100, nel=True)
    assert r.dt_matched[0, 0]
    assert r.dt_ignore[0, 1]            # the stray dt is ignored
    r2 = _evaluate_img_cat(dts, [gt], "bbox", ALL, 100, nel=False)
    assert not r2.dt_ignore[0, 1]       # ...but an FP when exhaustive


def test_max_dets_truncation():
    gt = _gt(_box(0, 0, 10, 10))
    dts = [_dt(_box(50, 50, 10, 10), 0.9 - 0.01 * i) for i in range(5)]
    dts.append(_dt(_box(0, 0, 10, 10), 0.5))   # the only TP, lowest score
    r = _evaluate_img_cat(dts, [gt], "bbox", ALL, max_dets=5)
    assert len(r.dt_scores) == 5
    assert not r.dt_matched.any()       # TP fell off the maxDets slate


def test_accumulate_101pt_ap_hand_computed():
    """2 gts, dts = [TP@.9, FP@.8]: rc=[.5,.5], pr=[1,.5] -> envelope
    [1,.5]; the 101-pt grid takes precision 1.0 for recall thresholds
    0.00..0.50 (51 points) and 0 beyond -> AP = 51/101."""
    gts = [_gt(_box(0, 0, 10, 10)), _gt(_box(100, 100, 10, 10))]
    dts = [_dt(_box(0, 0, 10, 10), 0.9), _dt(_box(50, 50, 10, 10), 0.8)]
    r = _evaluate_img_cat(dts, gts, "bbox", ALL, 100)
    prec, rec = _accumulate([r])
    assert rec[0] == pytest.approx(0.5)
    assert prec[0].mean() == pytest.approx(51.0 / 101.0)


def test_score_ordering_across_images():
    """accumulate merges dts across images by score (mergesort, stable):
    TP@.9 (img A) then FP@.8 (img B) -> same AP as the one-image case."""
    gts_a = [_gt(_box(0, 0, 10, 10))]
    gts_b = [_gt(_box(0, 0, 10, 10))]
    ra = _evaluate_img_cat([_dt(_box(0, 0, 10, 10), 0.9)], gts_a,
                           "bbox", ALL, 100)
    rb = _evaluate_img_cat([_dt(_box(50, 50, 10, 10), 0.8)], gts_b,
                           "bbox", ALL, 100)
    prec, rec = _accumulate([ra, rb])
    assert rec[0] == pytest.approx(0.5)
    assert prec[0].mean() == pytest.approx(51.0 / 101.0)


def _mini_lvis_evaluator():
    imgs = [
        {"id": 1, "width": 200, "height": 200, "neg_category_ids": [2],
         "not_exhaustive_category_ids": []},
        {"id": 2, "width": 200, "height": 200, "neg_category_ids": [],
         "not_exhaustive_category_ids": [1]},
    ]
    anns = [
        {"image_id": 1, "category_id": 1, "bbox": _box(0, 0, 10, 10),
         "iscrowd": 0, "area": 100.0},
        {"image_id": 2, "category_id": 1, "bbox": _box(0, 0, 10, 10),
         "iscrowd": 0, "area": 100.0},
    ]
    return imgs, anns


def test_lvis_nel_end_to_end():
    """Image 2 is not exhaustively annotated for cat 1: a stray cat-1 dt
    there is ignored -> AP stays 1.0. The same stray on image 1
    (exhaustive) becomes an FP -> AP drops."""
    imgs, anns = _mini_lvis_evaluator()
    base = [dict(image_id=a["image_id"], category_id=1,
                 bbox=list(a["bbox"]), score=0.9) for a in anns]
    ev = DetEvaluator(imgs, anns, [1], lvis=True,
                      cat_image_counts={1: 2}, max_dets=300)
    stray_nel = base + [dict(image_id=2, category_id=1,
                             bbox=_box(100, 100, 10, 10), score=0.95)]
    assert ev.evaluate(stray_nel, "bbox")["AP"] == pytest.approx(1.0)
    stray_ex = base + [dict(image_id=1, category_id=1,
                            bbox=_box(100, 100, 10, 10), score=0.95)]
    assert ev.evaluate(stray_ex, "bbox")["AP"] < 1.0


def test_lvis_frequency_field_preferred():
    imgs, anns = _mini_lvis_evaluator()
    dets = [dict(image_id=a["image_id"], category_id=1,
                 bbox=list(a["bbox"]), score=0.9) for a in anns]
    # image_count says frequent (>100) but the dataset field says rare
    ev = DetEvaluator(imgs, anns, [1], lvis=True,
                      cat_image_counts={1: 500}, cat_frequency={1: "r"},
                      max_dets=300)
    out = ev.evaluate(dets, "bbox")
    assert out["APr"] == pytest.approx(1.0)
    assert np.isnan(out["APf"])


def test_empty_gt_image_all_negatives_in_assigner():
    """ADVICE fix: zero valid gts must yield all-negative assignment."""
    import jax.numpy as jnp

    from iif_tpu.ops.assigner import max_iou_assign

    boxes = jnp.asarray([[0, 0, 10, 10], [5, 5, 20, 20]], jnp.float32)
    gt = jnp.zeros((3, 4), jnp.float32)
    gt_valid = jnp.zeros(3, bool)
    assigned, _ = max_iou_assign(boxes, gt, gt_valid, 0.7, 0.3, 0.3)
    assert (np.asarray(assigned) == 0).all()


def test_eval_loader_sharding_partitions_dataset(tmp_path):
    """Multi-host eval: strided shards are a disjoint cover, and merging
    per-shard results reproduces the single-host image set."""
    import json

    from iif_tpu.cli.test_det import _EvalLoader
    from iif_tpu.detection.datasets import CocoStyleDataset

    ann = {
        "categories": [{"id": 1, "name": "c"}],
        "images": [{"id": i, "file_name": f"{i}.jpg", "width": 64,
                    "height": 64} for i in range(10)],
        "annotations": [{"id": i + 1, "image_id": i, "category_id": 1,
                         "bbox": [1, 1, 10, 10], "area": 100, "iscrowd": 0}
                        for i in range(10)],
    }
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    ds = CocoStyleDataset(str(p), img_prefix=str(tmp_path), min_size=1)

    all_ids = []
    for shard in range(3):
        ld = _EvalLoader(ds, pipeline=None, batch_size=2, num_shards=3,
                         shard_id=shard)
        all_ids.extend(ld.indices)
    assert sorted(all_ids) == list(range(len(ds)))


def test_gather_objects_single_process():
    from iif_tpu.parallel import gather_objects

    obj = [{"image_id": 1, "score": 0.5}]
    assert gather_objects(obj) == [obj]


def test_error_analysis_stages():
    """coco_error_analysis semantics: perfect dets give 1.0 at every
    stage; a mislocalized det (IoU ~0.3) is an error at C50 but forgiven
    at Loc (IoU .1); a pure background FP is only forgiven at BG."""
    imgs = [{"id": 1, "width": 200, "height": 200}]
    anns = [{"image_id": 1, "category_id": 1, "bbox": _box(0, 0, 10, 10),
             "iscrowd": 0, "area": 100.0}]
    ev = DetEvaluator(imgs, anns, [1], max_dets=100)

    perfect = [dict(image_id=1, category_id=1, bbox=_box(0, 0, 10, 10),
                    score=0.9)]
    out = ev.error_analysis(perfect)["mean"]
    assert out["C75"] == out["C50"] == out["Loc"] == out["BG"] == 1.0

    # IoU = 25/175 ~ 0.14: fails C50, passes Loc
    shifted = [dict(image_id=1, category_id=1, bbox=_box(5, 5, 10, 10),
                    score=0.9)]
    out = ev.error_analysis(shifted)["mean"]
    assert out["C50"] == 0.0
    assert out["Loc"] == 1.0

    # far-away FP with a higher score: hurts Loc precision, forgiven at BG
    bg_fp = perfect + [dict(image_id=1, category_id=1,
                            bbox=_box(150, 150, 10, 10), score=0.95)]
    out = ev.error_analysis(bg_fp)["mean"]
    assert out["Loc"] < 1.0
    assert out["BG"] == 1.0
