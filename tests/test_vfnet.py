"""VFNet: varifocal loss parity vs the reference formula in torch, star
DCN offset geometry, loss/inference smoke, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg
from iif_tpu.detection.vfnet import (
    VFNet,
    star_dcn_offsets,
    varifocal_loss,
    vfnet_loss,
    vfnet_simple_test,
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
    for i in range(b):
        n = rng.randint(1, 5)
        for j in range(n):
            x1, y1 = rng.randint(0, W - 48), rng.randint(0, H - 48)
            w, h = rng.randint(24, 48), rng.randint(24, 48)
            gt_boxes[i, j] = [x1, y1, min(x1 + w, W), min(y1 + h, W)]
            gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
            gt_valid[i, j] = True
    return {"image": jnp.asarray(images),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_labels": jnp.asarray(gt_labels),
            "gt_valid": jnp.asarray(gt_valid)}


def test_varifocal_loss_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    pred = rng.randn(40, NUM_CLASSES).astype(np.float32)
    target = np.zeros((40, NUM_CLASSES), np.float32)
    pos = rng.rand(40) < 0.3
    target[pos, rng.randint(0, NUM_CLASSES, pos.sum())] = \
        rng.uniform(0.2, 1.0, pos.sum())
    ours = np.asarray(varifocal_loss(jnp.asarray(pred),
                                     jnp.asarray(target)))
    tp, tt = torch.from_numpy(pred), torch.from_numpy(target)
    psig = tp.sigmoid()
    fw = tt * (tt > 0).float() \
        + 0.75 * (psig - tt).abs().pow(2) * (tt <= 0).float()
    ref = (F.binary_cross_entropy_with_logits(tp, tt, reduction="none")
           * fw).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_star_offsets_geometry():
    """Tap absolute positions = cell + base + offset must land on the
    predicted box's star points (in feature-scale units)."""
    ltrb = jnp.asarray([[[[8.0, 16.0, 24.0, 32.0]]]])   # l,t,r,b @ stride 8
    off = np.asarray(star_dcn_offsets(ltrb, 8, gradient_mul=1.0))[0, 0, 0]
    base = np.stack(np.meshgrid([-1, 0, 1], [-1, 0, 1],
                                indexing="ij"), -1).reshape(9, 2)
    absolute = off + base                    # (9, 2) (dy, dx)
    l, t, r, b = 1.0, 2.0, 3.0, 4.0          # /stride
    exp = np.array([[-t, -l], [-t, 0], [-t, r],
                    [0, -l], [0, 0], [0, r],
                    [b, -l], [b, 0], [b, r]])
    np.testing.assert_allclose(absolute, exp, atol=1e-5)


@pytest.fixture(scope="module")
def vfnet():
    model = VFNet(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_vfnet_loss_and_grads(vfnet):
    model, variables = vfnet
    batch = _demo_inputs()
    total, losses, _ = vfnet_loss(model, variables, batch,
                                  jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_bbox_rf"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))

    def f(params):
        t, _, _ = vfnet_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return t

    grads = jax.grad(f)(variables["params"])
    for leaf in ("cls_dcn_kernel", "refine_dcn_kernel"):
        assert float(jnp.abs(grads["bbox_head"][leaf]).max()) > 0, leaf


def test_vfnet_empty_gt(vfnet):
    model, variables = vfnet
    batch = _demo_inputs()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses, _ = vfnet_loss(model, variables, batch,
                                  jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(losses["loss_bbox"]) == 0.0


def test_vfnet_simple_test_and_build(vfnet):
    model, variables = vfnet
    batch = _demo_inputs()
    out = vfnet_simple_test(model, variables, batch["image"],
                            SSTestCfg(nms_pre=200, max_per_img=20))
    assert out["boxes"].shape == (2, 20, 4)

    from iif_tpu.detection import build_detector

    m, _, _ = build_detector({"type": "VFNet", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, VFNet)
