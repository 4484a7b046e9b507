"""CornerNet: corner-pool parity vs the documented CUDA-op semantics
(torch cummax), hourglass shapes, loss/decode smoke, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.cornernet import (
    CornerNet,
    corner_pool,
    cornernet_loss,
    cornernet_simple_test,
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


def test_corner_pool_matches_torch_cummax():
    import torch

    rng = np.random.RandomState(0)
    x = rng.randn(2, 6, 7, 3).astype(np.float32)
    t = torch.from_numpy(x)
    refs = {
        "top": t.flip(1).cummax(1)[0].flip(1),
        "bottom": t.cummax(1)[0],
        "left": t.flip(2).cummax(2)[0].flip(2),
        "right": t.cummax(2)[0],
    }
    for d, ref in refs.items():
        ours = np.asarray(corner_pool(jnp.asarray(x), d))
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6), d


def test_hourglass_shapes():
    from iif_tpu.models.hourglass import HourglassNet

    model = HourglassNet(num_stacks=2,
                         stage_channels=(32, 32, 48, 48, 48, 64),
                         stage_blocks=(1, 1, 1, 1, 1, 2),
                         feat_channel=32)
    x = jnp.zeros((1, 128, 128, 3))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    outs = model.apply(variables, x, False)
    assert len(outs) == 2
    assert all(o.shape == (1, 32, 32, 32) for o in outs)


@pytest.fixture(scope="module")
def cornernet():
    model = CornerNet(num_classes=NUM_CLASSES, num_stacks=1)
    # shrink the hourglass for tests by monkey-free reconstruction
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_cornernet_loss(cornernet):
    model, variables = cornernet
    batch = _demo_inputs()
    total, losses, _ = cornernet_loss(model, variables, batch,
                                      jax.random.PRNGKey(0))
    for part in ("loss_heatmap", "loss_pull", "loss_push", "loss_offset"):
        k = f"s0.{part}"
        assert k in losses and np.isfinite(float(losses[k])), k
    assert np.isfinite(float(total))


def test_cornernet_decode(cornernet):
    model, variables = cornernet
    batch = _demo_inputs()
    out = cornernet_simple_test(
        model, variables, batch["image"],
        SSTestCfg(max_per_img=20, score_thr=0.0), k_corners=20)
    assert out["boxes"].shape == (2, 20, 4)
    b = np.asarray(out["boxes"])
    v = np.asarray(out["valid"])
    if v.any():
        assert (b[v][:, 2] >= b[v][:, 0]).all()
        assert (b[v][:, 3] >= b[v][:, 1]).all()


def test_cornernet_build():
    from iif_tpu.detection import build_detector

    m, _, _ = build_detector({"type": "CornerNet",
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, CornerNet)
