"""CocoPanopticDataset + PQ metric: hand-derived cases, randomized
differential parity vs the panopticapi-transcribed oracle, dataset
round-trip, heuristic_fuse -> evaluate chain."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from iif_tpu.detection.panoptic_eval import (  # noqa: E402
    INSTANCE_OFFSET,
    VOID,
    CocoPanopticDataset,
    id2rgb,
    pan_to_segments,
    pq_aggregate,
    pq_single,
    rgb2id,
)
from oracles.panoptic_oracle import pq_single_oracle  # noqa: E402

cv2 = pytest.importorskip("cv2")


def _segs(pan, iscrowd=()):
    ids, counts = np.unique(pan, return_counts=True)
    return {int(i): {"category_id": int(i) % INSTANCE_OFFSET
                     if i >= INSTANCE_OFFSET else int(i),
                     "area": int(c), "iscrowd": int(i in iscrowd)}
            for i, c in zip(ids, counts) if i != VOID}


def test_pq_perfect_match():
    pan = np.full((20, 20), 3, np.int64)           # one stuff region
    pan[2:10, 2:10] = 0 + 1 * INSTANCE_OFFSET      # one thing instance
    st = pq_single(pan, _segs(pan), pan, _segs(pan))
    agg = pq_aggregate([st], num_things=2, num_classes=5)
    assert agg["PQ"] == pytest.approx(100.0)
    assert agg["SQ"] == pytest.approx(100.0)
    assert agg["RQ"] == pytest.approx(100.0)


def test_pq_iou_boundary_and_value():
    # gt: 100-px thing; pred covers 60 of it + 60 outside -> IoU
    # 60/160 < 0.5 -> no match (1 FN + 1 FP)
    gt = np.full((20, 20), VOID, np.int64)
    gt[0:10, 0:10] = 1000
    pred = np.full((20, 20), VOID, np.int64)
    pred[4:10, 0:10] = 1000
    pred[10:16, 0:10] = 1000
    # pred area 120, inter 60, but 60 px sit on gt-void -> union
    # = 120 + 100 - 60 - 60 = 100, IoU 0.6 -> match (void carve-out!)
    st = pq_single(gt, _segs(gt), pred, _segs(pred))
    assert st[0][1] == 1 and st[0][0] == pytest.approx(0.6)

    # same pred against a gt that fills the outside with stuff: union
    # = 120 + 100 - 60 = 160, IoU 0.375 -> FN + FP
    gt2 = np.full((20, 20), 5, np.int64)
    gt2[0:10, 0:10] = 1000
    st2 = pq_single(gt2, _segs(gt2), pred, _segs(pred))
    iou, tp, fp, fn = st2[0]
    assert (tp, fp, fn) == (0, 1, 1)
    agg = pq_aggregate([st2], num_things=2, num_classes=6)
    # class 0: PQ = 0/(0+0.5+0.5) = 0; class 5 (stuff): FN only -> 0
    assert agg["PQ"] == 0.0


def test_pq_crowd_carveout():
    # unmatched crowd gt is not a FN; a pred mostly covered by crowd of
    # its own class is not a FP
    gt = np.full((10, 20), VOID, np.int64)
    gt[:, :10] = 1000          # crowd thing, class 0
    pred = np.full((10, 20), VOID, np.int64)
    pred[:, 2:8] = 1000        # fully inside the crowd region
    st = pq_single(gt, _segs(gt, iscrowd=(1000,)), pred, _segs(pred))
    iou, tp, fp, fn = st[0]
    assert (tp, fp, fn) == (0, 0, 0)

    # a pred of the same class sitting on labeled (non-crowd, non-void)
    # gt IS a FP; on pure void it is carved out instead
    gt2 = gt.copy()
    gt2[:, 10:] = 5                               # stuff fills the rest
    pred2 = np.full((10, 20), VOID, np.int64)
    pred2[:, 12:19] = 1000
    st2 = pq_single(gt2, _segs(gt2, iscrowd=(1000,)), pred2,
                    _segs(pred2))
    assert st2[0][2] == 1
    st3 = pq_single(gt, _segs(gt, iscrowd=(1000,)), pred2, _segs(pred2))
    assert st3[0][2] == 0                         # void carve-out


def _random_pan(rng, num_things, num_classes, shape=(32, 48), crowd_p=0.2):
    """Random blocky panoptic map + segment table."""
    pan = np.full(shape, VOID, np.int64)
    segments = {}
    inst = {c: 0 for c in range(num_things)}
    for _ in range(rng.randint(3, 9)):
        c = rng.randint(0, num_classes)
        y, x = rng.randint(0, shape[0] - 4), rng.randint(0, shape[1] - 4)
        h, w = rng.randint(3, 16), rng.randint(3, 16)
        if c < num_things:
            inst[c] += 1
            rid = c + inst[c] * INSTANCE_OFFSET
        else:
            rid = c
        pan[y:y + h, x:x + w] = rid
    ids, counts = np.unique(pan, return_counts=True)
    for i, n in zip(ids, counts):
        if i == VOID:
            continue
        segments[int(i)] = {
            "category_id": int(i) % INSTANCE_OFFSET
            if i >= INSTANCE_OFFSET else int(i),
            "area": int(n),
            "iscrowd": int(i >= INSTANCE_OFFSET
                           and rng.rand() < crowd_p)}
    return pan, segments


def test_pq_differential_vs_oracle():
    """20 random (gt, pred) pairs: our stats == the panopticapi
    transcription's (ids shifted +1 / void->0 for the oracle's
    convention)."""
    for seed in range(20):
        rng = np.random.RandomState(seed)
        gt, gt_segs = _random_pan(rng, 3, 8)
        pred, pred_segs = _random_pan(rng, 3, 8, crowd_p=0.0)
        for s in pred_segs.values():
            s["iscrowd"] = 0
        ours = pq_single(gt, gt_segs, pred, pred_segs)
        oracle = pq_single_oracle(
            gt + 1, {k + 1: v for k, v in gt_segs.items()},
            pred + 1, {k + 1: v for k, v in pred_segs.items()})
        cats = set(ours) | set(oracle)
        for c in cats:
            np.testing.assert_allclose(
                ours.get(c, np.zeros(4)), oracle.get(c, np.zeros(4)),
                atol=1e-12, err_msg=f"seed {seed} cat {c}")


def _write_panoptic_fixture(tmp_path):
    """2 images, 2 thing classes (ids 1, 2) + 1 stuff class (id 9)."""
    seg_dir = tmp_path / "panoptic_ann"
    img_dir = tmp_path / "images"
    seg_dir.mkdir()
    img_dir.mkdir()
    h, w = 40, 60
    images, annotations = [], []
    for i in range(2):
        pan = np.zeros((h, w), np.int64)          # 0 = void in the PNG
        pan[5:20, 5:25] = 7                        # thing (cat 1)
        pan[22:38, 30:55] = 8                      # thing (cat 2)
        pan[0:5, :] = 9000                         # stuff (cat 9)
        cv2.imwrite(str(seg_dir / f"{i}.png"),
                    cv2.cvtColor(id2rgb(pan), cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(img_dir / f"{i}.jpg"),
                    np.zeros((h, w, 3), np.uint8))
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "width": w, "height": h})
        annotations.append({
            "image_id": i, "file_name": f"{i}.png",
            "segments_info": [
                {"id": 7, "category_id": 1, "iscrowd": 0,
                 "bbox": [5, 5, 20, 15], "area": 300},
                {"id": 8, "category_id": 2, "iscrowd": 0,
                 "bbox": [30, 22, 25, 16], "area": 400},
                {"id": 9000, "category_id": 9, "iscrowd": 0,
                 "bbox": [0, 0, 60, 5], "area": 300}]})
    ann = {"images": images, "annotations": annotations,
           "categories": [
               {"id": 1, "name": "cat", "isthing": 1},
               {"id": 2, "name": "dog", "isthing": 1},
               {"id": 9, "name": "sky", "isthing": 0}]}
    path = tmp_path / "panoptic.json"
    path.write_text(json.dumps(ann))
    return path, seg_dir, img_dir


def test_panoptic_dataset_roundtrip(tmp_path):
    path, seg_dir, img_dir = _write_panoptic_fixture(tmp_path)
    ds = CocoPanopticDataset(str(path), img_prefix=str(img_dir),
                             seg_prefix=str(seg_dir))
    assert ds.CLASSES == ["cat", "dog", "sky"]
    assert ds.num_things == 2 and ds.num_stuff == 1
    assert len(ds) == 2
    ann = ds.get_ann(0)
    np.testing.assert_array_equal(ann["labels"], [0, 1])
    np.testing.assert_allclose(ann["boxes"][0], [5, 5, 25, 20])
    from iif_tpu.detection.mask_utils import rle_decode
    m = rle_decode(ann["segms"][0])
    assert m.sum() == 15 * 20 and m[10, 10] == 1

    sem = ds.semantic_map(0)
    assert sem[10, 10] == 0 and sem[30, 40] == 1 and sem[2, 30] == 2
    assert sem[30, 5] == 255                      # void

    counts = ds.class_instance_counts()
    np.testing.assert_array_equal(counts, [2, 2, 2])

    # self-prediction -> perfect PQ
    results = []
    for i in range(2):
        gt_pan, _ = ds.gt_pan_contiguous(i)
        results.append({"image_id": i, "pan": gt_pan})
    res = ds.evaluate(results)
    assert res["PQ"] == pytest.approx(100.0)
    assert res["PQ_th"] == pytest.approx(100.0)
    assert res["PQ_st"] == pytest.approx(100.0)

    # degrade one prediction: drop the dog instance on image 0
    bad = results[0]["pan"].copy()
    bad[bad % INSTANCE_OFFSET == 1] = VOID
    res2 = ds.evaluate([{"image_id": 0, "pan": bad}, results[1]])
    assert res2["PQ_th"] < 100.0 and res2["PQ_st"] == pytest.approx(100.0)


def test_fuse_to_segments_chain():
    """heuristic_fuse output feeds pan_to_segments/pq directly."""
    from iif_tpu.detection.panoptic import heuristic_fuse

    h, w = 32, 32
    masks = np.zeros((1, h, w), bool)
    masks[0, 4:20, 4:20] = True
    seg_logits = np.zeros((h, w, 2), np.float32)   # 1 stuff + things ch
    seg_logits[..., 0] = 1.0
    pan = heuristic_fuse(
        boxes=np.array([[4, 4, 20, 20]], np.float32),
        scores=np.array([0.9]), labels=np.array([0]),
        valid=np.array([True]), inst_masks=masks,
        seg_logits=seg_logits, num_things=2, stuff_area_limit=10)
    segs = pan_to_segments(pan, num_things=2)
    thing_ids = [i for i in segs if i >= INSTANCE_OFFSET]
    assert len(thing_ids) == 1
    assert segs[thing_ids[0]]["category_id"] == 0
    assert segs[thing_ids[0]]["area"] == 16 * 16
    assert segs[2]["category_id"] == 2            # stuff fills the rest


def test_pipeline_carries_semantic_seg(tmp_path):
    """with_seg: nearest resize + flip + 255-pad at seg_stride."""
    from iif_tpu.detection.pipeline import DetectionPipeline

    h0, w0 = 40, 60
    sem = np.full((h0, w0), 255, np.uint8)
    sem[0:20, 0:30] = 1                       # top-left quadrant class 1
    ann = {"boxes": np.array([[0, 0, 30, 20]], np.float32),
           "labels": np.array([0]), "segms": [None],
           "crowd_boxes": np.zeros((0, 4), np.float32),
           "height": h0, "width": w0, "semantic_seg": sem}
    img = np.zeros((h0, w0, 3), np.uint8)
    pipe = DetectionPipeline(canvas=(64, 96), scales=[(120, 80)],
                             flip_prob=1.0, max_gt=4, with_mask=False,
                             with_seg=True, seg_stride=4, emit_uint8=True)
    out = pipe(img, ann, np.random.RandomState(0), train=True)
    seg = out["gt_semantic_seg"]
    assert seg.shape == (16, 24) and seg.dtype == np.int32
    # keep-ratio factor = min(120/60, 80/40, 64/40, 96/60)=1.6 ->
    # nh,nw = 64,96; at stride 4 -> 16x24, no pad region
    # flipped: class-1 block moves to the RIGHT half, top 8 rows
    assert (seg[:8, 12:] == 1).all()
    assert (seg[:8, :12] == 255).all()
    assert (seg[8:, :] == 255).all()

    # no flip, smaller scale -> pad region stays 255
    pipe2 = DetectionPipeline(canvas=(64, 96), scales=[(60, 40)],
                              flip_prob=0.0, max_gt=4, with_mask=False,
                              with_seg=True, seg_stride=4,
                              emit_uint8=True)
    out2 = pipe2(img, ann, np.random.RandomState(0), train=True)
    seg2 = out2["gt_semantic_seg"]
    # factor=1.0 -> content 40x60 -> 10x15 cells; rest is pad
    assert (seg2[:5, :7] == 1).all()
    assert (seg2[10:, :] == 255).all() and (seg2[:, 15:] == 255).all()


def test_panoptic_pq_inference_chain(tmp_path):
    """Full chain: PanopticFPN random init -> run_inference(pan_out) ->
    CocoPanopticDataset.evaluate (the test_det --eval PQ path)."""
    import jax
    import jax.numpy as jnp

    from iif_tpu.cli.test_det import _EvalLoader, run_inference
    from iif_tpu.detection import build_detector
    from iif_tpu.detection.losses import DetCrossEntropyLoss
    from iif_tpu.detection.pipeline import DetectionPipeline

    path, seg_dir, img_dir = _write_panoptic_fixture(tmp_path)
    ds = CocoPanopticDataset(str(path), img_prefix=str(img_dir),
                             seg_prefix=str(seg_dir))
    model, _, test_cfg_cls = build_detector(
        {"type": "PanopticFPN", "depth": 18, "num_classes": 2,
         "num_stuff_classes": 1, "with_mask": True})
    test_cfg = test_cfg_cls(rpn_nms_pre=64, rpn_max_per_img=32,
                            score_thr=0.0, max_per_img=4)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    pipeline = DetectionPipeline(canvas=(64, 64), scales=[(64, 64)],
                                 flip_prob=0.0, max_gt=1,
                                 with_mask=True, emit_uint8=True)
    loader = _EvalLoader(ds, pipeline, batch_size=2)
    loss_cls = DetCrossEntropyLoss(num_classes=2)
    pan_out = []
    results = run_inference(model, variables, loader, loss_cls, test_cfg,
                            ds.cat_ids, with_mask=True, pan_out=pan_out)
    assert len(pan_out) == 2
    assert all(r["pan"].shape == (40, 60) for r in pan_out)
    res = ds.evaluate(pan_out)
    assert set(res) >= {"PQ", "PQ_th", "PQ_st", "SQ", "RQ"}
    assert all(np.isfinite(v) for v in res.values())
    assert isinstance(results, list)
