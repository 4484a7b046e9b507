"""Grid R-CNN: sub-region layout parity vs the reference arithmetic,
target painting vs a torch transcription, boundary-vote decode, loss,
dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    maskrcnn_loss,
    maskrcnn_simple_test,
)
from iif_tpu.detection.grid_rcnn import (
    GRID_POINTS,
    HALF_MAP,
    SUB_REGIONS,
    WHOLE_MAP,
    GridRCNN,
    calc_sub_regions,
    grid_refine_boxes,
    grid_targets,
)
from iif_tpu.detection.losses import DetCrossEntropyLoss

H = W = 128
NUM_CLASSES = 6
SMALL_CFG = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                        rcnn_num_samples=16, num_mask_rois=4,
                        roi_ext="flat")
SMALL_TEST = DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                        max_per_img=8, roi_ext="flat")


def _demo_inputs(seed=0):
    rng = np.random.RandomState(seed)
    return {"image": jnp.asarray(
        rng.randn(1, H, W, 3).astype(np.float32)),
        "gt_boxes": jnp.asarray([[[16, 16, 64, 64],
                                  [40, 30, 100, 90]]], jnp.float32),
        "gt_labels": jnp.asarray([[1, 2]]),
        "gt_valid": jnp.asarray([[True, True]])}


def test_sub_regions_match_reference_arithmetic():
    """Transcribe grid_head.py calc_sub_regions and compare."""
    half = WHOLE_MAP // 4 * 2
    ref = []
    for i in range(GRID_POINTS):
        x_idx, y_idx = i // 3, i % 3
        if x_idx == 0:
            sx = 0
        elif x_idx == 2:
            sx = half
        else:
            sx = max(int((x_idx / 2 - 0.25) * WHOLE_MAP), 0)
        if y_idx == 0:
            sy = 0
        elif y_idx == 2:
            sy = half
        else:
            sy = max(int((y_idx / 2 - 0.25) * WHOLE_MAP), 0)
        ref.append((sx, sy, sx + half, sy + half))
    assert calc_sub_regions() == ref == SUB_REGIONS


def test_grid_targets_match_torch_loop():
    import torch

    rng = np.random.RandomState(0)
    m = 4
    rois = np.zeros((m, 5), np.float32)
    rois[:, 1] = rng.uniform(10, 40, m)
    rois[:, 2] = rng.uniform(10, 40, m)
    rois[:, 3] = rois[:, 1] + rng.uniform(20, 50, m)
    rois[:, 4] = rois[:, 2] + rng.uniform(20, 50, m)
    gts = rois[:, 1:] + rng.uniform(-5, 5, (m, 4)).astype(np.float32)
    gts[:, 2:] = np.maximum(gts[:, 2:], gts[:, :2] + 8)

    ours, ok = grid_targets(jnp.asarray(rois), jnp.asarray(gts))
    ours = np.asarray(ours)

    # reference loop (grid_head.py:224-291)
    x1 = rois[:, 1] - (rois[:, 3] - rois[:, 1]) / 2
    y1 = rois[:, 2] - (rois[:, 4] - rois[:, 2]) / 2
    x2 = rois[:, 3] + (rois[:, 3] - rois[:, 1]) / 2
    y2 = rois[:, 4] + (rois[:, 4] - rois[:, 2]) / 2
    ws, hs = x2 - x1, y2 - y1
    targets = np.zeros((m, GRID_POINTS, WHOLE_MAP, WHOLE_MAP), np.float32)
    for i in range(m):
        if ws[i] <= 3 or hs[i] <= 3:
            continue
        for j in range(GRID_POINTS):
            fx = 1 - (j // 3) / 2
            fy = 1 - (j % 3) / 2
            gx = fx * gts[i, 0] + (1 - fx) * gts[i, 2]
            gy = fy * gts[i, 1] + (1 - fy) * gts[i, 3]
            cx = int((gx - x1[i]) / ws[i] * WHOLE_MAP)
            cy = int((gy - y1[i]) / hs[i] * WHOLE_MAP)
            for x in range(cx - 1, cx + 2):
                for y in range(cy - 1, cy + 2):
                    if 0 <= x < WHOLE_MAP and 0 <= y < WHOLE_MAP \
                            and (x - cx) ** 2 + (y - cy) ** 2 <= 1:
                        targets[i, j, y, x] = 1
    subs = []
    for j in range(GRID_POINTS):
        sx, sy, ex, ey = SUB_REGIONS[j]
        subs.append(targets[:, j, sy:ey, sx:ex])
    ref = np.stack(subs, -1)
    np.testing.assert_array_equal(ours, ref)


def test_grid_refine_identity_peak():
    """A heatmap peaked exactly at the gt grid points must vote the box
    back to (approximately) itself."""
    box = jnp.asarray([[20.0, 30.0, 80.0, 100.0]])
    tgt, ok = grid_targets(
        jnp.concatenate([jnp.zeros((1, 1)), box], axis=1), box)
    logits = jnp.where(tgt > 0, 8.0, -8.0)
    refined = np.asarray(grid_refine_boxes(logits, box, (H * 2, W * 2)))
    np.testing.assert_allclose(refined[0], np.asarray(box[0]), atol=2.0)


@pytest.fixture(scope="module")
def grid_rcnn():
    model = GridRCNN(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_grid_rcnn_loss_and_test(grid_rcnn):
    model, variables = grid_rcnn
    assert "grid_head" in variables["params"]
    batch = _demo_inputs()
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    total, losses, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls,
        SMALL_CFG)
    assert "loss_grid" in losses
    assert np.isfinite(float(losses["loss_grid"]))
    out = maskrcnn_simple_test(model, variables, batch["image"],
                               loss_cls, SMALL_TEST)
    assert out["boxes"].shape == (1, 8, 4)


def test_grid_rcnn_build():
    from iif_tpu.detection import build_detector

    m, _, _ = build_detector({"type": "GridRCNN", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, GridRCNN) and not m.with_mask
