"""YOLACT: protonet/coefficient assembly, crop semantics, losses
(incl. OHEM + area-reweighted mask BCE + semantic aux), fast-NMS
inference with per-box mask crops, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg
from iif_tpu.detection.yolact import (
    NUM_PROTOS,
    YOLACT,
    _crop_mask,
    yolact_loss,
    yolact_simple_test,
)

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8


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


def test_crop_mask_zeroes_outside():
    m = jnp.ones((16, 16))
    out = np.asarray(_crop_mask(m, jnp.asarray([0.25, 0.25, 0.75, 0.75])))
    assert out[8, 8] == 1.0
    assert out[0, 0] == 0.0
    assert out[15, 15] == 0.0


@pytest.fixture(scope="module")
def yolact():
    model = YOLACT(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_yolact_params(yolact):
    model, variables = yolact
    p = variables["params"]
    assert "protonet" in p and "segm_head" in p
    assert p["bbox_head"]["conv_coeff"]["kernel"].shape[-1] \
        == 3 * NUM_PROTOS


def test_yolact_loss(yolact):
    model, variables = yolact
    batch = _demo_inputs()
    total, losses, _ = yolact_loss(model, variables, batch,
                                   jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_mask",
                           "loss_segm"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))
    assert float(losses["loss_mask"]) > 0

    def f(params):
        t, _, _ = yolact_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return t

    grads = jax.grad(f)(variables["params"])
    for head in ("protonet", "segm_head"):
        leaves = jax.tree_util.tree_leaves(grads[head])
        assert max(float(jnp.abs(g).max()) for g in leaves) > 0, head
    g_coeff = grads["bbox_head"]["conv_coeff"]["kernel"]
    assert float(jnp.abs(g_coeff).max()) > 0


def test_yolact_empty_gt(yolact):
    model, variables = yolact
    batch = _demo_inputs()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses, _ = yolact_loss(model, variables, batch,
                                   jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(losses["loss_bbox"]) == 0.0
    assert float(losses["loss_mask"]) == 0.0


def test_yolact_simple_test(yolact):
    model, variables = yolact
    batch = _demo_inputs()
    out = yolact_simple_test(model, variables, batch["image"],
                             SSTestCfg(nms_pre=128, max_per_img=10))
    assert out["boxes"].shape == (2, 10, 4)
    assert out["masks"].shape == (2, 10, 28, 28)
    m = np.asarray(out["masks"])
    assert (m >= 0).all() and (m <= 1).all()


def test_yolact_build():
    from iif_tpu.detection import build_detector

    m, _, _ = build_detector({"type": "YOLACT", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, YOLACT)
