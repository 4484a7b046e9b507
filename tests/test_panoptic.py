"""Panoptic FPN: label-space merge parity vs a torch transcription,
semantic loss, heuristic fusion semantics, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.detector import DetTrainCfg, maskrcnn_loss
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.detection.panoptic import (
    PanopticFPN,
    heuristic_fuse,
    set_things_to_void,
)

H = W = 128
NUM_CLASSES = 6
NUM_STUFF = 5

SMALL_CFG = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                        rcnn_num_samples=16, num_mask_rois=4,
                        roi_ext="flat")


def _demo_inputs(seed=0):
    rng = np.random.RandomState(seed)
    gt_masks = np.zeros((1, 2, H, W), np.uint8)
    gt_masks[0, 0, 16:64, 16:64] = 1
    gt_masks[0, 1, 30:90, 40:100] = 1
    seg = rng.randint(0, NUM_CLASSES + NUM_STUFF, (1, H // 4, W // 4))
    seg[0, 0, 0] = 255
    return {"image": jnp.asarray(
        rng.randn(1, H, W, 3).astype(np.float32)),
        "gt_boxes": jnp.asarray([[[16, 16, 64, 64],
                                  [40, 30, 100, 90]]], jnp.float32),
        "gt_labels": jnp.asarray([[1, 2]]),
        "gt_valid": jnp.asarray([[True, True]]),
        "gt_masks": jnp.asarray(gt_masks),
        "gt_semantic_seg": jnp.asarray(seg)}


def test_set_things_to_void_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    gt = rng.randint(0, 140, (8, 8)).astype(np.int32)
    ours = np.asarray(set_things_to_void(jnp.asarray(gt), 80, 53))

    t = torch.from_numpy(gt).int()
    fg = (t >= 0) & (t <= 79)
    bg = (t >= 80) & (t <= 132)
    ref = t.clone()
    ref = torch.where(bg, t - 80, ref)
    ref = torch.where(fg, fg.int() * 53, ref)
    # our version additionally maps out-of-range ids to ignore (-1);
    # in-range pixels must agree exactly
    in_range = (fg | bg).numpy()
    np.testing.assert_array_equal(ours[in_range],
                                  ref.numpy()[in_range])
    assert (ours[~in_range] == -1).all()


def test_panoptic_loss_has_seg_term():
    model = PanopticFPN(num_classes=NUM_CLASSES, depth=18,
                        num_stuff_classes=NUM_STUFF, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    assert "semantic_head" in variables["params"]
    batch = _demo_inputs()
    total, losses, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0),
        DetCrossEntropyLoss(NUM_CLASSES), SMALL_CFG)
    assert "loss_seg" in losses
    assert np.isfinite(float(losses["loss_seg"]))
    assert float(losses["loss_seg"]) > 0


def test_heuristic_fuse():
    h = w = 32
    masks = np.zeros((2, h, w), bool)
    masks[0, 4:20, 4:20] = True          # high score
    masks[1, 10:26, 10:26] = True        # overlaps > 0.5? area 256,
    masks[1, :, :] = False
    masks[1, 12:22, 12:22] = True        # 100 px, 64 overlap -> skipped
    boxes = np.zeros((2, 4), np.float32)
    scores = np.asarray([0.9, 0.5], np.float32)
    labels = np.asarray([3, 1])
    valid = np.asarray([True, True])
    seg = np.zeros((h, w, NUM_STUFF + 1), np.float32)
    seg[..., 2] = 1.0                    # stuff id 2 everywhere
    pan = heuristic_fuse(boxes, scores, labels, valid, masks, seg,
                         num_things=NUM_CLASSES, stuff_area_limit=10)
    assert pan[10, 10] == 3 + 1000       # instance 1 of class 3
    # the low-score overlapped instance was skipped (>50% covered)
    assert (pan == 1 + 2 * 1000).sum() == 0
    assert pan[30, 30] == NUM_CLASSES + 2   # stuff fill


def test_panoptic_build():
    from iif_tpu.detection import build_detector

    m, _, _ = build_detector(
        {"type": "PanopticFPN", "depth": 18, "num_classes": NUM_CLASSES,
         "num_stuff_classes": NUM_STUFF})
    assert isinstance(m, PanopticFPN)
