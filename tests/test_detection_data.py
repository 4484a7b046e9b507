"""Detection data layer: RLE codec, COCO dataset parsing, repeat-factor
sampling, pipeline, and the from-scratch AP evaluator."""
import json

import numpy as np
import pytest

from iif_tpu.detection.datasets import (
    CocoStyleDataset,
    expand_indices_by_repeat,
    group_epoch_order,
    repeat_factors,
)
from iif_tpu.detection.evaluation import DetEvaluator, detections_to_coco_results
from iif_tpu.detection.mask_utils import (
    mask_area,
    polygons_to_bitmap,
    rle_decode,
    rle_encode,
    rle_iou,
)
from iif_tpu.detection.pipeline import DetectionPipeline


# ------------------------------------------------------------ RLE codec
def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        m = (rng.rand(37, 53) > 0.7).astype(np.uint8)
        rle = rle_encode(m)
        assert isinstance(rle["counts"], str)
        back = rle_decode(rle)
        np.testing.assert_array_equal(back, m)
        assert mask_area(rle) == m.sum()


def test_rle_empty_and_full():
    z = np.zeros((8, 8), np.uint8)
    np.testing.assert_array_equal(rle_decode(rle_encode(z)), z)
    o = np.ones((8, 8), np.uint8)
    np.testing.assert_array_equal(rle_decode(rle_encode(o)), o)


def test_polygon_rasterization():
    m = polygons_to_bitmap([[10, 10, 30, 10, 30, 30, 10, 30]], 40, 40)
    assert m[20, 20] == 1
    assert m[5, 5] == 0
    assert 19 * 19 < m.sum() < 22 * 22


def test_rle_iou():
    a = np.zeros((20, 20), np.uint8)
    a[:10] = 1
    b = np.zeros((20, 20), np.uint8)
    b[5:15] = 1
    ra, rb = rle_encode(a), rle_encode(b)
    iou = rle_iou([ra], [rb], [False])
    assert iou[0, 0] == pytest.approx(100 / 300, rel=1e-6)


# ---------------------------------------------------------- COCO dataset
def _toy_coco(tmp_path, n_imgs=4):
    cats = [{"id": 1, "name": "cat", "image_count": 3},
            {"id": 2, "name": "dog", "image_count": 1}]
    images = [{"id": i, "file_name": f"{i}.jpg", "width": 64, "height": 48,
               "neg_category_ids": [2] if i == 0 else []}
              for i in range(n_imgs)]
    anns = []
    aid = 1
    for i in range(n_imgs - 1):  # last image empty
        anns.append({"id": aid, "image_id": i, "category_id": 1,
                     "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0,
                     "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]]})
        aid += 1
    anns.append({"id": aid, "image_id": 1, "category_id": 2,
                 "bbox": [30, 10, 10, 10], "area": 100, "iscrowd": 0,
                 "segmentation": [[30, 10, 40, 10, 40, 20, 30, 20]]})
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(
        {"categories": cats, "images": images, "annotations": anns}))
    return str(path)


def test_coco_dataset_parsing(tmp_path):
    ds = CocoStyleDataset(_toy_coco(tmp_path), filter_empty_gt=True)
    assert len(ds) == 3  # empty image filtered
    assert ds.CLASSES == ["cat", "dog"]
    ann = ds.get_ann(0)
    assert ann["boxes"].shape == (1, 4)
    np.testing.assert_allclose(ann["boxes"][0], [5, 5, 25, 25])
    assert ann["labels"][0] == 0
    counts = ds.class_image_counts()
    assert counts.tolist() == [3, 1]  # from image_count metadata


def test_repeat_factors(tmp_path):
    ds = CocoStyleDataset(_toy_coco(tmp_path))
    # dog appears in 1/3 images; with thr=0.5 its factor = sqrt(0.5/(1/3))
    rf = repeat_factors(ds, oversample_thr=0.5)
    assert rf.shape == (3,)
    dog_factor = np.sqrt(0.5 / (1 / 3))
    assert rf[1] == pytest.approx(max(1.0, dog_factor), rel=1e-6)
    assert rf[0] == pytest.approx(max(1.0, np.sqrt(0.5 / 1.0)), rel=1e-6)
    expanded = expand_indices_by_repeat(rf)
    assert (expanded == 1).sum() == int(np.ceil(rf[1]))


def test_group_epoch_order_homogeneous_batches():
    flags = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.uint8)
    order = group_epoch_order(flags, np.arange(8), epoch=0, samples_per_gpu=2)
    for b in range(0, len(order), 2):
        grp = flags[order[b:b + 2]]
        assert (grp == grp[0]).all()


# --------------------------------------------------------------- pipeline
def test_pipeline_static_canvas(tmp_path):
    ds = CocoStyleDataset(_toy_coco(tmp_path))
    pipe = DetectionPipeline(canvas=(96, 160), scales=[(160, 96)], max_gt=5)
    rng = np.random.RandomState(0)
    img = np.random.RandomState(1).randint(0, 255, (48, 64, 3), np.uint8)
    out = pipe(img, ds.get_ann(0), rng, train=True)
    assert out["image"].shape == (96, 160, 3)
    assert out["gt_boxes"].shape == (5, 4)
    assert out["gt_masks"].shape == (5, 96, 160)
    assert out["gt_valid"].sum() == 1
    # keep_ratio: min(max_long/long, max_short/short) = min(160/64, 96/48)
    # = 2.0; canvas clamp leaves it at 2.0
    assert out["scale_factor"] == pytest.approx(2.0)


def test_evaluator_perfect_detections(tmp_path):
    ds = CocoStyleDataset(_toy_coco(tmp_path), filter_empty_gt=False)
    gt_anns = []
    for rec in ds.img_infos:
        gt_anns.extend(rec["anns"])
    ev = DetEvaluator(ds.img_infos, gt_anns, ds.cat_ids)
    dets = [dict(image_id=a["image_id"], category_id=a["category_id"],
                 bbox=list(a["bbox"]), score=0.9) for a in gt_anns]
    res = ev.evaluate(dets, "bbox")
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)


def test_evaluator_missed_detection(tmp_path):
    ds = CocoStyleDataset(_toy_coco(tmp_path), filter_empty_gt=False)
    gt_anns = []
    for rec in ds.img_infos:
        gt_anns.extend(rec["anns"])
    ev = DetEvaluator(ds.img_infos, gt_anns, ds.cat_ids)
    dets = [dict(image_id=a["image_id"], category_id=a["category_id"],
                 bbox=list(a["bbox"]), score=0.9)
            for a in gt_anns if a["category_id"] == 1]
    res = ev.evaluate(dets, "bbox")
    # cat AP = 1, dog AP = 0 -> mean 0.5
    assert res["AP"] == pytest.approx(0.5)


def test_evaluator_localization_threshold(tmp_path):
    ds = CocoStyleDataset(_toy_coco(tmp_path), filter_empty_gt=False)
    gt_anns = [a for rec in ds.img_infos for a in rec["anns"]
               if a["category_id"] == 1]
    ev = DetEvaluator(ds.img_infos, gt_anns, [1])
    # shifted boxes: IoU ~ 0.6 -> match at low thrs only
    dets = [dict(image_id=a["image_id"], category_id=1,
                 bbox=[a["bbox"][0] + 5, a["bbox"][1], a["bbox"][2],
                       a["bbox"][3]], score=0.9) for a in gt_anns]
    res = ev.evaluate(dets, "bbox")
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert 0.0 < res["AP"] < 1.0


def test_evaluator_lvis_protocol(tmp_path):
    """Detections of category c on images where c is neither positive nor
    negative must be ignored (LVIS federated annotation rule)."""
    ds = CocoStyleDataset(_toy_coco(tmp_path), filter_empty_gt=False)
    gt_anns = [a for rec in ds.img_infos for a in rec["anns"]]
    ev = DetEvaluator(ds.img_infos, gt_anns, ds.cat_ids, lvis=True,
                      cat_image_counts=ds.cat_image_counts, max_dets=300)
    dets = [dict(image_id=a["image_id"], category_id=a["category_id"],
                 bbox=list(a["bbox"]), score=0.9) for a in gt_anns]
    # spurious dog detection on image 2 (dog not pos/neg there) -> ignored
    dets.append(dict(image_id=2, category_id=2, bbox=[0, 0, 10, 10],
                     score=0.95))
    res = ev.evaluate(dets, "bbox")
    assert res["AP"] == pytest.approx(1.0)
    assert "APr" in res and "APf" in res
    # a false positive on image 0 (dog IS in neg_category_ids) must hurt
    dets.append(dict(image_id=0, category_id=2, bbox=[0, 0, 10, 10],
                     score=0.99))
    res2 = ev.evaluate(dets, "bbox")
    assert res2["AP"] < 1.0


def test_evaluator_segm(tmp_path):
    from iif_tpu.detection.mask_utils import rle_encode, segm_to_bitmap

    ds = CocoStyleDataset(_toy_coco(tmp_path), filter_empty_gt=False)
    gt_anns = []
    for rec in ds.img_infos:
        for a in rec["anns"]:
            a = dict(a)
            a["segmentation"] = rle_encode(segm_to_bitmap(
                a["segmentation"], rec["height"], rec["width"]))
            gt_anns.append(a)
    ev = DetEvaluator(ds.img_infos, gt_anns, ds.cat_ids)
    dets = [dict(image_id=a["image_id"], category_id=a["category_id"],
                 bbox=list(a["bbox"]), score=0.9,
                 segmentation=a["segmentation"]) for a in gt_anns]
    res = ev.evaluate(dets, "segm")
    assert res["AP"] == pytest.approx(1.0)


def test_detections_to_coco_results():
    boxes = np.array([[[0, 0, 10, 20], [0, 0, 0, 0]]])
    scores = np.array([[0.8, 0.0]])
    labels = np.array([[1, -1]])
    valid = np.array([[True, False]])
    out = detections_to_coco_results([42], boxes, scores, labels, valid,
                                     cat_ids=[7, 9])
    assert len(out) == 1
    assert out[0]["image_id"] == 42
    assert out[0]["category_id"] == 9
    assert out[0]["bbox"] == [0, 0, 10, 20]


def test_concat_and_repeat_wrappers(tmp_path):
    from iif_tpu.detection.datasets import ConcatDataset, RepeatDataset

    ds = CocoStyleDataset(_toy_coco(tmp_path))
    cat = ConcatDataset([ds, ds])
    assert len(cat) == 2 * len(ds)
    np.testing.assert_allclose(cat.get_ann(len(ds))["boxes"],
                               ds.get_ann(0)["boxes"])
    assert cat.image_path(len(ds) + 1) == ds.image_path(1)
    rep = RepeatDataset(ds, 3)
    assert len(rep) == 3 * len(ds)
    assert rep.class_image_counts().tolist() == \
        (3 * ds.class_image_counts()).tolist()


def test_photometric_distortion_shapes():
    from iif_tpu.detection.pipeline import PhotoMetricDistortion

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 80, 3), np.uint8)
    s = {"image": img, "boxes": np.zeros((0, 4), np.float32),
         "labels": np.zeros(0, np.int64), "masks": None}
    out = PhotoMetricDistortion()(s, rng)
    assert out["image"].shape == (64, 80, 3)
    assert out["image"].dtype == np.uint8


def test_random_crop_shifts_and_drops_boxes():
    from iif_tpu.detection.pipeline import RandomCrop

    rng = np.random.RandomState(3)
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = np.array([[10, 10, 30, 30], [80, 80, 95, 95]], np.float32)
    labels = np.array([1, 2])
    masks = np.zeros((2, 100, 100), np.uint8)
    masks[0, 10:30, 10:30] = 1
    masks[1, 80:95, 80:95] = 1
    s = {"image": img, "boxes": boxes, "labels": labels, "masks": masks}
    # deterministic crop: window as large as the image -> no-op content
    out = RandomCrop((100, 100))(dict(s), rng)
    np.testing.assert_allclose(out["boxes"], boxes)
    # 40x40 window at origin keeps only the first box
    class _FixedRng:
        def randint(self, lo, hi=None):
            return 0
    out = RandomCrop((40, 40))(dict(s), _FixedRng())
    assert len(out["boxes"]) == 1
    np.testing.assert_allclose(out["boxes"][0], [10, 10, 30, 30])
    assert out["labels"].tolist() == [1]
    assert out["masks"].shape == (1, 40, 40)


def test_cutout_fills_holes():
    from iif_tpu.detection.pipeline import CutOut

    rng = np.random.RandomState(0)
    img = np.full((50, 50, 3), 200, np.uint8)
    s = {"image": img, "boxes": np.zeros((0, 4), np.float32),
         "labels": np.zeros(0, np.int64)}
    out = CutOut(n_holes=2, cutout_shape=(10, 10), fill_in=(0, 0, 0))(s, rng)
    assert (out["image"] == 0).any()
    assert out["image"].shape == (50, 50, 3)


def test_pipeline_with_extra_transforms():
    from iif_tpu.detection.pipeline import (CutOut, DetectionPipeline,
                                            PhotoMetricDistortion)

    rng = np.random.RandomState(0)
    pipe = DetectionPipeline(
        canvas=(64, 96), scales=[(96, 64)], max_gt=4, mask_stride=1,
        extra_transforms=[PhotoMetricDistortion(), CutOut(1, (8, 8))])
    img = rng.randint(0, 255, (60, 90, 3), np.uint8)
    ann = {"boxes": np.array([[5, 5, 40, 40]], np.float32),
           "labels": np.array([0]), "segms": [None],
           "height": 60, "width": 90}
    out = pipe(img, ann, rng, train=True)
    assert out["image"].shape == (64, 96, 3)
    assert out["gt_valid"][0]
    assert out["gt_masks"].shape == (4, 64, 96)
    assert out["gt_masks"][0].sum() > 0


def test_build_extra_transforms_factory():
    from iif_tpu.detection.pipeline import build_extra_transforms

    ts = build_extra_transforms([
        dict(type="PhotoMetricDistortion", brightness_delta=16),
        dict(type="RandomCrop", crop_size=(32, 32)),
        dict(type="CutOut", n_holes=1, cutout_shape=(4, 4)),
    ])
    assert len(ts) == 3


def test_mosaic_composes_four_images():
    from iif_tpu.detection.pipeline import Mosaic

    rng = np.random.RandomState(0)

    def _part(v, n):
        img = np.full((60, 90, 3), v, np.uint8)
        return {"image": img,
                "boxes": np.tile([[5, 5, 40, 40]], (n, 1)).astype(np.float32),
                "labels": np.full(n, v % 7, np.int64)}

    s = _part(10, 2)
    s["mix_results"] = [_part(50, 1), _part(100, 1), _part(200, 3)]
    out = Mosaic(img_scale=(64, 64))(s, rng)
    assert out["image"].shape == (128, 128, 3)
    # all four sources appear on the canvas
    assert {10, 50, 100, 200} <= set(np.unique(out["image"]))
    assert len(out["boxes"]) == len(out["labels"]) > 0
    assert (out["boxes"][:, 0::2] <= 128).all()
    assert (out["boxes"][:, 2] > out["boxes"][:, 0]).all()
    assert "mix_results" not in out


def test_det_mixup_blends_and_concats_boxes():
    from iif_tpu.detection.pipeline import DetMixUp

    rng = np.random.RandomState(1)
    s = {"image": np.zeros((80, 80, 3), np.uint8),
         "boxes": np.array([[5, 5, 30, 30]], np.float32),
         "labels": np.array([1], np.int64)}
    other = {"image": np.full((80, 80, 3), 255, np.uint8),
             "boxes": np.array([[10, 10, 70, 70]], np.float32),
             "labels": np.array([3], np.int64)}
    s["mix_results"] = [other]
    out = DetMixUp(img_scale=(80, 80), ratio_range=(1.0, 1.0),
                   flip_ratio=0.0)(s, rng)
    assert out["image"].shape == (80, 80, 3)
    # 0.5 blend: the white partner region must be mid-gray-ish somewhere
    assert 100 < out["image"].max() <= 160
    assert len(out["boxes"]) == 2 and set(out["labels"]) == {1, 3}


def test_random_affine_identity_bounds():
    from iif_tpu.detection.pipeline import RandomAffine

    rng = np.random.RandomState(2)
    img = np.zeros((100, 120, 3), np.uint8)
    img[20:60, 30:80] = 255
    s = {"image": img,
         "boxes": np.array([[30, 20, 80, 60]], np.float32),
         "labels": np.array([2], np.int64)}
    # identity-ish: no rotation/shear/translation, unit scale
    out = RandomAffine(max_rotate_degree=0, max_translate_ratio=0,
                       scaling_ratio_range=(1.0, 1.0),
                       max_shear_degree=0)(dict(s), rng)
    assert out["image"].shape == (100, 120, 3)
    np.testing.assert_allclose(out["boxes"], s["boxes"], atol=1.5)
    # a real warp keeps the box count sane and inside bounds
    out2 = RandomAffine()(dict(s), np.random.RandomState(5))
    assert (out2["boxes"][:, 0::2] <= 120).all() if len(out2["boxes"]) \
        else True


def test_fast_nms_matches_exact_on_separated_boxes():
    import jax.numpy as jnp

    from iif_tpu.ops.nms import fast_nms, multiclass_nms

    # far-apart boxes: fast NMS and exact NMS must agree exactly
    boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60], [100, 100, 110, 110],
                      [0.5, 0.5, 10.5, 10.5]], np.float32)
    scores = np.zeros((4, 3), np.float32)
    scores[:, 0] = [0.9, 0.8, 0.7, 0.6]   # class 0; col 2 = background
    d1, s1, l1, v1 = fast_nms(jnp.asarray(boxes), jnp.asarray(scores),
                              0.05, 0.5, 10, 5)
    d2, s2, l2, v2 = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                                    0.05, 0.5, 5)
    assert int(v1.sum()) == int(v2.sum()) == 3
    np.testing.assert_allclose(np.sort(np.asarray(s1)[np.asarray(v1)]),
                               np.sort(np.asarray(s2)[np.asarray(v2)]),
                               atol=1e-6)


def test_fast_nms_oversuppression_semantics():
    import jax.numpy as jnp

    from iif_tpu.ops.nms import fast_nms

    # chain a-b-c where a~b and b~c but a!~c: exact NMS keeps a, c;
    # fast NMS keeps only a (b suppressed by a still suppresses c? no —
    # c's IoU with a is low, with b is high; fast NMS drops c because it
    # only checks against higher-scored boxes regardless of their fate)
    boxes = np.array([[0, 0, 10, 10], [3, 0, 13, 10], [6, 0, 16, 10]],
                     np.float32)
    scores = np.zeros((3, 2), np.float32)
    scores[:, 0] = [0.9, 0.8, 0.7]
    d, s, l, v = fast_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          0.05, 0.5, 10, 5)
    kept = np.asarray(s)[np.asarray(v)]
    assert 0.9 in kept and 0.8 not in kept and 0.7 not in kept


def test_analyze_results_ranks_images(tmp_path, capsys, monkeypatch):
    import json as _json
    import sys

    ann_path = _toy_coco(tmp_path)
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        "model = dict(type='MaskRCNN', num_classes=2, depth=18)\n"
        "data = dict(test=dict(type='CocoDataset', "
        f"ann_file={str(ann_path)!r}, filter_empty_gt=False))\n")
    # image 0: perfect detection; image 1: a bad one (wrong place)
    results = [
        {"image_id": 0, "category_id": 1, "bbox": [5, 5, 20, 20],
         "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [40, 30, 5, 5],
         "score": 0.9},
    ]
    res_path = tmp_path / "res.json"
    res_path.write_text(_json.dumps(results))
    from iif_tpu.cli.analysis import main

    monkeypatch.setattr(sys, "argv", [
        "analysis", "analyze_results", str(cfg_path), str(res_path),
        "--topk", "2"])
    main()
    out = capsys.readouterr().out
    assert "worst 2 images" in out and "best 2 images" in out
    # the perfect image ranks best, the mislocated one worst
    best_block = out.split("best 2 images:")[1]
    assert "0.jpg: 1.000" in best_block
    worst_block = out.split("best 2 images:")[0]
    assert "1.jpg: 0.000" in worst_block


def test_corruptions_shapes_and_determinism():
    from iif_tpu.detection.corruptions import (CORRUPTION_SETS,
                                               available_corruptions,
                                               corrupt)

    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (48, 64, 3), np.uint8)
    for name in available_corruptions():
        out = corrupt(img, name, 3, seed=7)
        assert out.shape == img.shape and out.dtype == np.uint8, name
        np.testing.assert_array_equal(out, corrupt(img, name, 3, seed=7))
        assert np.abs(out.astype(int) - img.astype(int)).mean() > 0.1, name
    # severity 0 = identity; groups reference only known names
    np.testing.assert_array_equal(corrupt(img, "gaussian_noise", 0), img)
    for group in CORRUPTION_SETS.values():
        assert set(group) <= set(available_corruptions())
    with pytest.raises(KeyError):
        corrupt(img, "nope", 1)


def test_corruption_severity_increases_distortion():
    from iif_tpu.detection.corruptions import corrupt

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    for name in ("gaussian_noise", "contrast", "pixelate"):
        d = [np.abs(corrupt(img, name, s, seed=3).astype(float)
                    - img).mean() for s in (1, 5)]
        assert d[1] > d[0], name


def test_canvas_buckets(tmp_path):
    import cv2

    from iif_tpu.detection.pipeline import DetectionLoader

    ann_path = _toy_coco(tmp_path, n_imgs=8)
    rng = np.random.RandomState(0)
    for i in range(8):
        cv2.imwrite(str(tmp_path / f"{i}.jpg"),
                    rng.randint(0, 255, (48, 64, 3), np.uint8))
    ds = CocoStyleDataset(ann_path, img_prefix=str(tmp_path))
    scales = [(320, 160), (320, 192), (320, 256)]
    pipe = DetectionPipeline(canvas=(256, 320), scales=scales, max_gt=4,
                             canvas_buckets=True)
    # one canvas per distinct short side, clamped 32-divisible
    assert pipe.canvas_of == [(160, 320), (192, 320), (256, 320)]
    assert len(pipe.buckets) == 3
    loader = DetectionLoader(ds, pipe, batch_size=2, seed=0, num_workers=2)
    seen = set()
    for epoch in range(4):
        loader.set_epoch(epoch)
        for batch in loader:
            h, w = batch["image"].shape[1:3]
            seen.add((h, w))
            assert (h, w) in {(160, 320), (192, 320), (256, 320)}
            assert batch["gt_masks"].shape[2:] == (h, w)
    assert len(seen) >= 2  # multiple buckets actually sampled


def test_canvas_buckets_off_by_default(tmp_path):
    ds = CocoStyleDataset(_toy_coco(tmp_path))
    pipe = DetectionPipeline(canvas=(256, 320),
                             scales=[(320, 160), (320, 256)], max_gt=4)
    assert pipe.buckets == [((256, 320), [0, 1])]


# ------------------------------------------- uint8 canvas + packed masks
def test_pipeline_emit_uint8_matches_float_path(tmp_path):
    """uint8 emission + device-side normalize must reproduce the float
    pipeline's normalized pixels exactly on the content region (pad region
    differs only by the uint8 rounding of the mean pixel)."""
    import jax.numpy as jnp

    from iif_tpu.detection.detector import normalize_if_uint8

    ds = CocoStyleDataset(_toy_coco(tmp_path))
    img = np.random.RandomState(1).randint(0, 255, (48, 64, 3), np.uint8)
    rng_a, rng_b = np.random.RandomState(7), np.random.RandomState(7)
    pf = DetectionPipeline(canvas=(96, 160), scales=[(160, 96)], max_gt=5)
    pu = DetectionPipeline(canvas=(96, 160), scales=[(160, 96)], max_gt=5,
                           emit_uint8=True, pack_masks=True)
    of = pf(img, ds.get_ann(0), rng_a, train=True)
    ou = pu(img, ds.get_ann(0), rng_b, train=True)
    assert ou["image"].dtype == np.uint8
    norm = np.asarray(normalize_if_uint8(jnp.asarray(ou["image"])))
    nh, nw = ou["img_shape"]
    np.testing.assert_array_equal(norm[:nh, :nw], of["image"][:nh, :nw])
    # pad region (right of the 2x-scaled 64-wide content): normalized
    # rounded-mean pixel is ~0
    assert nw < 160
    assert np.abs(norm[:, nw:]).max() < 0.01
    # packed masks roundtrip through the device unpack
    from iif_tpu.detection.detector import unpack_mask_bits

    unpacked = np.asarray(unpack_mask_bits(
        jnp.asarray(ou["gt_masks_packed"]), 160))
    np.testing.assert_array_equal(unpacked, of["gt_masks"])


def test_pipeline_emit_uint8_rejects_custom_stats():
    with pytest.raises(ValueError, match="emit_uint8"):
        DetectionPipeline(canvas=(96, 160), scales=[(160, 96)],
                          mean=np.array([0.0, 0.0, 0.0], np.float32),
                          emit_uint8=True)


def test_detection_loader_prefetch_deterministic(tmp_path):
    """The producer-thread prefetch must yield exactly the sequence the
    unprefetched loader yields, and propagate worker exceptions."""
    import cv2

    ann_path = _toy_coco(tmp_path, n_imgs=8)
    rng = np.random.RandomState(0)
    for i in range(8):
        cv2.imwrite(str(tmp_path / f"{i}.jpg"),
                    rng.randint(0, 255, (48, 64, 3), np.uint8))
    ds = CocoStyleDataset(ann_path, img_prefix=str(tmp_path))
    pipe = DetectionPipeline(canvas=(96, 160), scales=[(160, 96)], max_gt=4)
    from iif_tpu.detection.pipeline import DetectionLoader

    l0 = DetectionLoader(ds, pipe, batch_size=2, seed=3, num_workers=2,
                         prefetch=0)
    l3 = DetectionLoader(ds, pipe, batch_size=2, seed=3, num_workers=2,
                         prefetch=3)
    b0, b3 = list(l0), list(l3)
    assert len(b0) == len(b3) > 0
    for x, y in zip(b0, b3):
        assert sorted(x) == sorted(y)
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
    # exception propagation: point the loader at a missing image
    ds_bad = CocoStyleDataset(ann_path, img_prefix=str(tmp_path / "nope"))
    l_bad = DetectionLoader(ds_bad, pipe, batch_size=2, seed=3,
                            num_workers=2, prefetch=3)
    with pytest.raises(FileNotFoundError):
        list(l_bad)


def test_instaboost_moves_instance_consistently():
    """InstaBoost keeps box == tight bbox of the warped mask and leaves
    the sample untouched when no masks are present."""
    import numpy as np

    from iif_tpu.detection.pipeline import InstaBoost

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (80, 80, 3)).astype(np.float32)
    mask = np.zeros((80, 80), np.uint8)
    mask[20:40, 25:45] = 1
    s = {"image": img, "boxes": np.array([[25., 20., 45., 40.]]),
         "labels": np.array([0]), "masks": mask[None]}
    t = InstaBoost(aug_ratio=1.0)
    moved = False
    for seed in range(8):
        out = t({k: (v.copy() if hasattr(v, "copy") else v)
                 for k, v in s.items()}, np.random.RandomState(seed))
        ys, xs = np.nonzero(out["masks"][0])
        if len(ys):
            np.testing.assert_array_equal(
                out["boxes"][0],
                [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
        if not np.array_equal(out["boxes"], s["boxes"]):
            moved = True
    assert moved                     # some seed actually augmented

    no_mask = {"image": img.copy(), "boxes": s["boxes"].copy(),
               "labels": s["labels"], "masks": None}
    out = InstaBoost(aug_ratio=1.0)(no_mask, np.random.RandomState(0))
    np.testing.assert_array_equal(out["boxes"], s["boxes"])


def test_voc_xml_dataset(tmp_path):
    """VOCDataset parses XML splits into coco-style records: 1-based ->
    0-based boxes, difficult -> ignore (crowd), folder tag for
    WIDER-Face."""
    import os

    import numpy as np

    from iif_tpu.detection.datasets import VOCDataset, WIDERFaceDataset

    ann_dir = tmp_path / "Annotations"
    os.makedirs(ann_dir)
    xml = """<annotation><folder>ev0</folder>
    <filename>{name}.jpg</filename>
    <size><width>100</width><height>80</height><depth>3</depth></size>
    <object><name>dog</name><difficult>0</difficult>
      <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>51</xmax>
      <ymax>61</ymax></bndbox></object>
    <object><name>cat</name><difficult>1</difficult>
      <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>31</xmax>
      <ymax>31</ymax></bndbox></object>
    <object><name>unknown</name>
      <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>9</xmax>
      <ymax>9</ymax></bndbox></object>
    </annotation>"""
    for name in ("im0", "im1"):
        (ann_dir / f"{name}.xml").write_text(xml.format(name=name))
    split = tmp_path / "trainval.txt"
    split.write_text("im0\nim1\n")

    ds = VOCDataset(str(split), img_prefix=str(tmp_path))
    assert len(ds) == 2 and len(ds.CLASSES) == 20
    ann = ds.get_ann(0)
    np.testing.assert_allclose(ann["boxes"], [[10, 20, 50, 60]])
    assert ds.CLASSES[int(ann["labels"][0])] == "dog"
    # difficult object became an ignore (crowd) region
    np.testing.assert_allclose(ann["crowd_boxes"], [[0, 0, 30, 30]])
    assert ds.img_infos[0]["file_name"].endswith("JPEGImages/im0.jpg")
    counts = ds.class_instance_counts()
    assert counts[ds.CLASSES.index("dog")] == 2 and counts.sum() == 2

    wf = WIDERFaceDataset(str(split), img_prefix=str(tmp_path),
                          filter_empty_gt=False)
    assert wf.CLASSES == ["face"]
    assert "ev0/im0.jpg" in wf.img_infos[0]["file_name"]


def test_proposal_file_through_loader(tmp_path):
    """FastRCNN data path (reference CustomDataset(proposal_file=...) +
    LoadProposals): proposals load from a pickle aligned with the json
    image order, survive empty-gt filtering, rescale/flip with the image,
    and arrive padded in the batch."""
    import pickle

    from iif_tpu.detection.pipeline import DetectionLoader

    ann = _toy_coco(tmp_path)
    # one (n, 5) scored entry per UNFILTERED image (4 images)
    props = [np.array([[0, 0, 10, 10, 0.5], [2, 2, 30, 20, 0.9]], np.float32),
             np.array([[1, 1, 9, 9, 0.7]], np.float32),
             np.zeros((0, 5), np.float32),
             np.array([[3, 3, 8, 8, 0.1]], np.float32)]
    ppath = tmp_path / "props.pkl"
    with open(ppath, "wb") as f:
        pickle.dump(props, f)

    ds = CocoStyleDataset(ann, img_prefix=str(tmp_path),
                          filter_empty_gt=True,
                          proposal_file=str(ppath))
    assert ds.with_proposals and len(ds) == 3
    # image 3 (empty) was filtered; survivors keep their own proposals
    np.testing.assert_allclose(ds.get_proposals(1), props[1])

    pipe = DetectionPipeline(canvas=(96, 160), scales=[(160, 96)], max_gt=5,
                             flip_prob=0.0, max_proposals=8,
                             with_mask=False)
    rng = np.random.RandomState(0)
    img = np.random.RandomState(1).randint(0, 255, (48, 64, 3), np.uint8)
    out = pipe(img, ds.get_ann(0), rng, train=True,
               proposals=ds.get_proposals(0))
    assert out["proposals"].shape == (8, 4)
    assert out["proposals_valid"].sum() == 2
    # score-sorted: the 0.9 proposal first, scaled by keep-ratio factor 2
    np.testing.assert_allclose(out["proposals"][0], [4, 4, 60, 40])

    # flip: x-coords mirror in the resized frame
    pipe_flip = DetectionPipeline(canvas=(96, 160), scales=[(160, 96)],
                                  max_gt=5, flip_prob=1.0, max_proposals=8,
                                  with_mask=False)
    out_f = pipe_flip(img, ds.get_ann(0), rng, train=True,
                      proposals=ds.get_proposals(0))
    nw = 128  # 64 * 2
    np.testing.assert_allclose(out_f["proposals"][0],
                               [nw - 60, 4, nw - 4, 40])

    # loader end-to-end: batches carry padded proposals
    import cv2

    for i in range(4):
        cv2.imwrite(str(tmp_path / f"{i}.jpg"),
                    np.random.RandomState(i).randint(
                        0, 255, (48, 64, 3), np.uint8))
    loader = DetectionLoader(ds, pipe, batch_size=2, seed=0, prefetch=0)
    batch = next(iter(loader))
    assert batch["proposals"].shape == (2, 8, 4)
    assert batch["proposals_valid"].shape == (2, 8)


def test_full_hendrycks_corruption_protocol():
    """The complete ICLR'19 protocol: 15 benchmark + 4 holdout families
    (reference test_robustness.py applies all of them through the
    imagecorruptions package)."""
    from iif_tpu.detection.corruptions import (CORRUPTION_SETS,
                                               available_corruptions)

    bench = CORRUPTION_SETS["benchmark"]
    assert len(bench) == 15
    for name in ("glass_blur", "frost", "snow", "elastic_transform"):
        assert name in bench
    assert set(CORRUPTION_SETS["holdout"]) == {
        "speckle_noise", "gaussian_blur", "spatter", "saturate"}
    # benchmark = noise + blur + weather + digital, disjointly
    union = sum((CORRUPTION_SETS[g]
                 for g in ("noise", "blur", "weather", "digital")), [])
    assert sorted(union) == sorted(bench)
    assert len(available_corruptions()) == 19


def test_new_corruption_families_severity_monotonic():
    from iif_tpu.detection.corruptions import corrupt

    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (64, 80, 3), np.uint8)
    for name in ("glass_blur", "frost", "snow", "spatter",
                 "elastic_transform"):
        d = [np.abs(corrupt(img, name, s, seed=3).astype(float)
                    - img).mean() for s in (1, 5)]
        assert d[1] > d[0], (name, d)


def test_glass_shuffle_is_a_permutation():
    """The native glass swap only exchanges pixels — the multiset of
    pixel values is exactly preserved (a strong correctness invariant
    for the C++ path)."""
    from iif_tpu.native.imgproc_native import (glass_shuffle,
                                               imgproc_native_available)

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (40, 56, 3), np.uint8)
    out = glass_shuffle(img, delta=3, iters=2, seed=11)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)
    # per-channel value histograms identical
    for c in range(3):
        np.testing.assert_array_equal(
            np.bincount(img[..., c].ravel(), minlength=256),
            np.bincount(out[..., c].ravel(), minlength=256))
    assert imgproc_native_available()  # g++ is in the image
    # determinism
    np.testing.assert_array_equal(out, glass_shuffle(img, 3, 2, 11))


def test_elastic_transform_published_alpha_table():
    """Severity constants follow the imagecorruptions table
    alpha = 250 * {0.05, 0.065, 0.085, 0.1, 0.12}."""
    import inspect

    from iif_tpu.detection import corruptions

    src = inspect.getsource(corruptions.elastic_transform)
    for mult in ("0.05", "0.065", "0.085", "0.1", "0.12"):
        assert mult in src
    src = inspect.getsource(corruptions.glass_blur)
    assert "(0.7, 1, 2)" in src and "(1.5, 4, 2)" in src
    src = inspect.getsource(corruptions.frost)
    assert "(1, 0.4)" in src and "(0.6, 0.75)" in src
