"""NAS-FCOS: searched neck shapes, DCNv2 towers, FCOS-loss dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.nasfcos import (
    NASFCOS,
    NASFCOSFPN,
    ModulatedDeformBlock,
    nasfcos_loss,
    nasfcos_simple_test,
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


def test_modulated_deform_zero_offsets_is_plain_conv():
    """With the zero-initialized offset/mask conv, DCNv2's offsets are 0
    and masks are sigmoid(0)=0.5 — output = 0.5 * plain conv."""
    m = ModulatedDeformBlock(8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 4),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    w = v["params"]["weight"]
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(out, 0.5 * np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_nasfcos_fpn_shapes():
    neck = NASFCOSFPN(out_channels=32)
    ins = [jnp.zeros((1, 32 // s, 32 // s, c))
           for s, c in zip((1, 2, 4, 8), (64, 128, 256, 512))]
    v = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(v, ins)
    assert [o.shape[1] for o in outs] == [16, 8, 4, 2, 1]
    assert all(o.shape[-1] == 32 for o in outs)


@pytest.fixture(scope="module")
def nasfcos():
    model = NASFCOS(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_nasfcos_loss_and_test(nasfcos):
    model, variables = nasfcos
    batch = _demo_inputs()
    total, losses, _ = nasfcos_loss(model, variables, batch,
                                    jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_centerness"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
    out = nasfcos_simple_test(model, variables, batch["image"],
                              SSTestCfg(nms_pre=200, max_per_img=20))
    assert out["boxes"].shape == (2, 20, 4)


def test_nasfcos_build_dispatch():
    from iif_tpu.detection import build_detector
    from iif_tpu.detection.single_stage import single_stage_loss_fn

    m, _, _ = build_detector({"type": "NASFCOS", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, NASFCOS)
    # NASFCOS subclasses FCOS: the FCOS loss drives it
    assert single_stage_loss_fn(m).__name__ == "fcos_loss"
