"""AutoAssign: center-prior geometry, pos/neg/center losses and their
gradients (incl. the learnable prior), inference, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.autoassign import (
    AutoAssign,
    autoassign_loss,
    autoassign_simple_test,
)
from iif_tpu.detection.single_stage import SSTestCfg

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8


def _demo_inputs(b=2, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, H, W, 3).astype(np.float32)
    gt_boxes = np.zeros((b, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int64)
    gt_valid = np.zeros((b, MAX_GT), bool)
    for i in range(b):
        n = rng.randint(1, 4)
        for j in range(n):
            x1, y1 = rng.randint(0, W - 48), rng.randint(0, H - 48)
            w, h = rng.randint(24, 48), rng.randint(24, 48)
            gt_boxes[i, j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
            gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
            gt_valid[i, j] = True
    return {"image": jnp.asarray(images),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_labels": jnp.asarray(gt_labels),
            "gt_valid": jnp.asarray(gt_valid)}


@pytest.fixture(scope="module")
def autoassign():
    model = AutoAssign(num_classes=NUM_CLASSES, depth=18,
                       frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_autoassign_params(autoassign):
    model, variables = autoassign
    p = variables["params"]["bbox_head"]
    assert p["center_prior_mean"].shape == (NUM_CLASSES, 2)
    assert p["center_prior_sigma"].shape == (NUM_CLASSES, 2)
    np.testing.assert_allclose(np.asarray(p["center_prior_mean"]), 0.0)
    np.testing.assert_allclose(np.asarray(p["center_prior_sigma"]), 1.0)


def test_autoassign_loss_and_prior_grads(autoassign):
    model, variables = autoassign
    batch = _demo_inputs()
    total, losses, _ = autoassign_loss(model, variables, batch,
                                       jax.random.PRNGKey(0))
    assert set(losses) == {"loss_pos", "loss_neg", "loss_center"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))

    def f(params):
        t, _, _ = autoassign_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return t

    grads = jax.grad(f)(variables["params"])
    # the learnable center prior must receive gradient
    for leaf in ("center_prior_mean", "center_prior_sigma"):
        assert float(jnp.abs(grads["bbox_head"][leaf]).max()) > 0, leaf


def test_autoassign_empty_gt(autoassign):
    model, variables = autoassign
    batch = _demo_inputs()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses, _ = autoassign_loss(model, variables, batch,
                                       jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(losses["loss_pos"]) == 0.0


def test_autoassign_simple_test_and_build(autoassign):
    model, variables = autoassign
    batch = _demo_inputs()
    out = autoassign_simple_test(model, variables, batch["image"],
                                 SSTestCfg(nms_pre=200, max_per_img=20))
    assert out["boxes"].shape == (2, 20, 4)

    from iif_tpu.detection import build_detector

    m, _, _ = build_detector({"type": "AutoAssign", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, AutoAssign)
