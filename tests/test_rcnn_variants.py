"""R-CNN family variants: Faster R-CNN (box-only), Fast R-CNN
(precomputed proposals), RPN-only detector, and Mask Scoring R-CNN
(MaskIoU head) — dispatch, loss, inference, and a numpy differential
test of the mask-IoU target math against the reference semantics
(``maskiou_head.py`` get_targets + ``BitmapMasks.crop``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection import build_detector
from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    MaskRCNN,
    maskrcnn_loss,
    maskrcnn_simple_test,
)
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.detection.mask_head import (
    mask_area_ratio,
    mask_iou_targets,
)
from iif_tpu.detection.rpn_detector import (
    RPNDetector,
    rpn_only_loss,
    rpn_only_simple_test,
)

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8

SMALL_CFG = DetTrainCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                        rcnn_num_samples=32, num_mask_rois=8,
                        roi_ext="flat")
SMALL_TEST = DetTestCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                        max_per_img=16, roi_ext="flat")


def _demo_inputs(b=2, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, H, W, 3).astype(np.float32)
    gt_boxes = np.zeros((b, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int64)
    gt_valid = np.zeros((b, MAX_GT), bool)
    gt_masks = np.zeros((b, MAX_GT, H, W), np.uint8)
    for i in range(b):
        n = rng.randint(1, 5)
        for j in range(n):
            x1, y1 = rng.randint(0, W - 40), rng.randint(0, H - 40)
            w, h = rng.randint(16, 40), rng.randint(16, 40)
            gt_boxes[i, j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
            gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
            gt_valid[i, j] = True
            gt_masks[i, j, y1:y1 + h, x1:x1 + w] = 1
    return {"image": jnp.asarray(images),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_labels": jnp.asarray(gt_labels),
            "gt_valid": jnp.asarray(gt_valid),
            "gt_masks": jnp.asarray(gt_masks)}


# -------------------------------------------------------------- dispatch
def test_build_detector_variants():
    m, tr, te = build_detector({"type": "FasterRCNN", "depth": 18,
                                "num_classes": NUM_CLASSES})
    assert isinstance(m, MaskRCNN) and not m.with_mask and m.with_rpn
    m, _, _ = build_detector({"type": "FastRCNN", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, MaskRCNN) and not m.with_rpn
    m, _, _ = build_detector({"type": "MaskScoringRCNN", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, MaskRCNN) and m.with_mask_iou
    m, _, _ = build_detector({"type": "RPN", "depth": 18,
                              "cls_predictor": "linear", "with_mask": False})
    assert isinstance(m, RPNDetector)


# ---------------------------------------------------------- Faster R-CNN
def test_faster_rcnn_loss_and_test():
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                     with_mask=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), False)
    batch = _demo_inputs()
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    total, losses, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls,
        SMALL_CFG)
    assert "loss_mask" not in losses
    assert np.isfinite(float(total)) and float(total) > 0
    out = maskrcnn_simple_test(model, variables, batch["image"],
                               loss_cls, SMALL_TEST)
    assert "masks" not in out
    assert out["boxes"].shape == (2, 16, 4)


# ------------------------------------------------------------ Fast R-CNN
def test_fast_rcnn_proposals_from_batch():
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                     with_mask=False, with_rpn=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), False)
    assert "rpn_head" not in variables["params"]
    batch = _demo_inputs()
    rng = np.random.RandomState(3)
    props = np.zeros((2, 24, 4), np.float32)
    props[..., :2] = rng.uniform(0, W - 32, (2, 24, 2))
    props[..., 2:] = props[..., :2] + rng.uniform(8, 32, (2, 24, 2))
    batch["proposals"] = jnp.asarray(np.clip(props, 0, W))
    batch["proposals_valid"] = jnp.ones((2, 24), bool)
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    total, losses, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls,
        SMALL_CFG)
    assert "loss_rpn_cls" not in losses
    assert np.isfinite(float(total)) and float(losses["loss_cls"]) > 0
    out = maskrcnn_simple_test(
        model, variables, batch["image"], loss_cls, SMALL_TEST,
        proposals=batch["proposals"],
        proposals_valid=batch["proposals_valid"])
    assert out["boxes"].shape == (2, 16, 4)


# --------------------------------------------------------------- RPN-only
def test_rpn_detector_loss_and_proposals():
    model = RPNDetector(depth=18, frozen_stages=-1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), False)
    batch = _demo_inputs()
    total, losses, aux = rpn_only_loss(
        model, variables, batch, jax.random.PRNGKey(0), SMALL_CFG)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox"}
    assert np.isfinite(float(total)) and float(total) > 0
    assert aux["batch_stats"]
    out = rpn_only_simple_test(model, variables, batch["image"],
                               SMALL_TEST)
    assert out["boxes"].shape == (2, 64, 4)
    assert bool(out["valid"].any())
    assert int(out["labels"].max()) == 0


def test_rpn_detector_trainer_step():
    import optax

    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model = RPNDetector(depth=18, frozen_stages=-1)
    trainer = DetectionTrainer(
        model, None, optax.sgd(1e-3), make_mesh(), train_cfg=SMALL_CFG)
    state = trainer.init_state((H, W, 3))
    batch = _demo_inputs()
    state2, metrics = trainer._train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


# ------------------------------------------------- Mask Scoring R-CNN
def _ref_mask_iou_targets(rois, gt_inds, gt_masks, mask_pred, mask_tgt):
    """Numpy transcription of maskiou_head.py get_targets +
    BitmapMasks.crop int-truncate/clamp semantics."""
    r = rois.shape[0]
    out = np.zeros(r, np.float32)
    hh, ww = gt_masks.shape[-2:]
    for i in range(r):
        b = int(rois[i, 0])
        m = gt_masks[b, gt_inds[i]]
        x1, y1, x2, y2 = rois[i, 1:].astype(np.int32)
        x1 = np.clip(x1, 0, ww - 1)
        y1 = np.clip(y1, 0, hh - 1)
        bw = np.clip(x2 - x1, 1, ww - x1)
        bh = np.clip(y2 - y1, 1, hh - y1)
        in_box = m[y1:y1 + bh, x1:x1 + bw].sum()
        full = m.sum()
        ratio = in_box / (full + 1e-7)
        pred = (1 / (1 + np.exp(-mask_pred[i])) > 0.5).astype(np.float32)
        overlap = (pred * mask_tgt[i]).sum()
        gt_full = mask_tgt[i].sum() / (ratio + 1e-7)
        denom = pred.sum() + gt_full - overlap
        out[i] = overlap / denom if ratio > 0 and denom > 0 else 0.0
    return out


def test_mask_iou_targets_match_numpy_reference():
    rng = np.random.RandomState(0)
    b, g = 2, 4
    gt_masks = (rng.rand(b, g, 64, 64) > 0.5).astype(np.float32)
    rois = np.zeros((6, 5), np.float32)
    rois[:, 0] = rng.randint(0, b, 6)
    rois[:, 1] = rng.uniform(0, 30, 6)
    rois[:, 2] = rng.uniform(0, 30, 6)
    rois[:, 3] = rois[:, 1] + rng.uniform(8, 30, 6)
    rois[:, 4] = rois[:, 2] + rng.uniform(8, 30, 6)
    gt_inds = rng.randint(0, g, 6)
    mask_pred = rng.randn(6, 28, 28).astype(np.float32)
    mask_tgt = (rng.rand(6, 28, 28) > 0.5).astype(np.float32)

    ours_ratio = np.asarray(mask_area_ratio(
        jnp.asarray(rois), jnp.asarray(gt_inds), jnp.asarray(gt_masks)))
    ours = np.asarray(mask_iou_targets(
        jnp.asarray(mask_pred), jnp.asarray(mask_tgt),
        jnp.asarray(ours_ratio)))
    ref = _ref_mask_iou_targets(rois, gt_inds, gt_masks, mask_pred,
                                mask_tgt)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_mask_scoring_rcnn_loss_and_test():
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                     with_mask_iou=True)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), False)
    assert "mask_iou_head" in variables["params"]
    batch = _demo_inputs()
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    total, losses, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls,
        SMALL_CFG)
    assert "loss_mask_iou" in losses
    assert np.isfinite(float(losses["loss_mask_iou"]))

    # gradients flow into the mask-iou head
    def f(params):
        t, _, _ = maskrcnn_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0), loss_cls, SMALL_CFG)
        return t

    grads = jax.grad(f)(variables["params"])
    gnorm = jnp.linalg.norm(
        grads["mask_iou_head"]["fc_mask_iou"]["kernel"])
    assert float(gnorm) > 0

    out = maskrcnn_simple_test(model, variables, batch["image"],
                               loss_cls, SMALL_TEST)
    assert "mask_scores" in out
    assert out["mask_scores"].shape == out["scores"].shape


def test_mask_score_used_for_segm_eval():
    from iif_tpu.detection.evaluation import DetEvaluator

    gt_images = [{"id": 1, "width": 32, "height": 32}]
    from iif_tpu.detection.mask_utils import rle_encode

    m = np.zeros((32, 32), np.uint8)
    m[4:20, 4:20] = 1
    gt = [{"id": 1, "image_id": 1, "category_id": 1,
           "bbox": [4, 4, 16, 16], "area": 256.0, "iscrowd": 0,
           "segmentation": rle_encode(m)}]
    # a perfect-mask low-score det and a bad-mask high-score det: with
    # mask_score the perfect one ranks first -> AP 1.0 at IoU .5
    bad = np.zeros((32, 32), np.uint8)
    bad[24:30, 24:30] = 1
    dts = [
        {"image_id": 1, "category_id": 1, "bbox": [4, 4, 16, 16],
         "score": 0.3, "mask_score": 0.9, "segmentation": rle_encode(m),
         "area": 256.0},
        {"image_id": 1, "category_id": 1, "bbox": [24, 24, 6, 6],
         "score": 0.8, "mask_score": 0.1, "segmentation": rle_encode(bad),
         "area": 36.0},
    ]
    ev = DetEvaluator(gt_images, gt, [1])
    segm = ev.evaluate(dts, "segm")
    ev2 = DetEvaluator(gt_images, gt, [1])
    no_ms = [dict(d) for d in dts]
    for d in no_ms:
        d.pop("mask_score")
    segm_plain = ev2.evaluate(no_ms, "segm")
    assert segm["AP50"] > segm_plain["AP50"]


def test_fast_rcnn_simple_test_dispatch_needs_proposals():
    """make_simple_test marks the FastRCNN fn so eval surfaces feed
    batch['proposals'] instead of crashing on the with_rpn assert."""
    from iif_tpu.detection.simple_test import make_simple_test

    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                     with_mask=False, with_rpn=False)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), False)
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    fn, needs_shape = make_simple_test(model, loss_cls, SMALL_TEST)
    assert getattr(fn, "needs_proposals", False) and not needs_shape
    props = jnp.asarray([[[8, 8, 40, 40], [16, 16, 56, 60]]], jnp.float32)
    out = fn(variables, jnp.zeros((1, H, W, 3)), props,
             jnp.ones((1, 2), bool))
    assert out["boxes"].shape[0] == 1

    # with_rpn models are NOT marked
    fn2, _ = make_simple_test(
        MaskRCNN(num_classes=NUM_CLASSES, depth=18, with_mask=False),
        loss_cls, SMALL_TEST)
    assert not getattr(fn2, "needs_proposals", False)
