"""PointRend: point-sampling geometry vs grid_sample, coarse+point
losses, subdivision inference shape, full detector loss/test,
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
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.detection.point_rend import (
    PointRend,
    get_uncertain_point_coords_train,
    point_rend_refine_masks,
    sample_fine_grained,
)

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8

SMALL_CFG = DetTrainCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                        rcnn_num_samples=32, num_mask_rois=8,
                        roi_ext="flat")
SMALL_TEST = DetTestCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                        max_per_img=8, roi_ext="flat")


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


def test_sample_fine_grained_matches_grid_sample():
    """Our roi-relative point sampling must equal torch grid_sample on
    the absolute coordinates (align_corners=False)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    p2 = rng.randn(2, 16, 16, 5).astype(np.float32)
    rois = np.array([[0, 4.0, 8.0, 36.0, 56.0],
                     [1, 0.0, 0.0, 64.0, 64.0]], np.float32)
    rel = rng.uniform(0, 1, (2, 10, 2)).astype(np.float32)
    ours = np.asarray(sample_fine_grained(
        jnp.asarray(p2), jnp.asarray(rois), jnp.asarray(rel)))

    for r in range(2):
        b = int(rois[r, 0])
        xs_img = rois[r, 1] + rel[r, :, 0] * (rois[r, 3] - rois[r, 1])
        ys_img = rois[r, 2] + rel[r, :, 1] * (rois[r, 4] - rois[r, 2])
        gx = (torch.from_numpy(xs_img / 4.0)) / 16 * 2 - 1
        gy = (torch.from_numpy(ys_img / 4.0)) / 16 * 2 - 1
        grid = torch.stack([gx, gy], -1)[None, None]
        t = torch.from_numpy(p2[b]).permute(2, 0, 1)[None]
        ref = F.grid_sample(t, grid, align_corners=False,
                            padding_mode="zeros")[0, :, 0].T.numpy()
        np.testing.assert_allclose(ours[r], ref, rtol=1e-4, atol=1e-5)


def test_uncertain_points_shape_and_range():
    rng = np.random.RandomState(1)
    coarse = jnp.asarray(rng.randn(4, 7, 7, NUM_CLASSES).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, NUM_CLASSES, 4))
    pts = get_uncertain_point_coords_train(
        jax.random.PRNGKey(0), coarse, labels, num_points=16,
        oversample_ratio=3)
    assert pts.shape == (4, 16, 2)
    p = np.asarray(pts)
    assert (p >= 0).all() and (p <= 1).all()


@pytest.fixture(scope="module")
def point_rend():
    model = PointRend(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_point_rend_params(point_rend):
    model, variables = point_rend
    p = variables["params"]
    assert "coarse_mask_head" in p and "point_head" in p
    assert "mask_head" not in p        # the FCN branch is replaced


def test_point_rend_loss(point_rend):
    model, variables = point_rend
    batch = _demo_inputs()
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    total, losses, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls,
        SMALL_CFG)
    assert "loss_mask" in losses and "loss_point" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def f(params):
        t, _, _ = maskrcnn_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0), loss_cls, SMALL_CFG)
        return t

    grads = jax.grad(f)(variables["params"])
    for head in ("coarse_mask_head", "point_head"):
        leaf = grads[head]["fc_logits"]["kernel"]
        assert float(jnp.abs(leaf).max()) > 0, head


def test_point_rend_subdivision_doubles(point_rend):
    model, variables = point_rend
    batch = _demo_inputs()
    feats = model.apply(variables, batch["image"], False,
                        method=PointRend.extract_feat)
    rois = jnp.asarray([[0, 8.0, 8.0, 72.0, 72.0],
                        [1, 0.0, 0.0, 48.0, 64.0]], jnp.float32)
    labels = jnp.asarray([1, 2])
    out = point_rend_refine_masks(model, variables, feats, rois, labels,
                                  subdivision_steps=2)
    assert out.shape == (2, 28, 28)


def test_point_rend_simple_test_and_build(point_rend):
    model, variables = point_rend
    batch = _demo_inputs()
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    out = maskrcnn_simple_test(
        model, variables, batch["image"], loss_cls,
        SMALL_TEST._replace())
    assert out["masks"].shape == (2, 8, 224, 224)

    from iif_tpu.detection import build_detector

    m, _, _ = build_detector({"type": "PointRend", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, PointRend)
