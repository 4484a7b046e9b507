"""GFL detector: Integral/DFL/QFL golden math vs torch transcriptions of
``gfocal_loss.py``, loss/inference smoke, and dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.gfl import (
    GFL,
    bbox2distance,
    distribution_focal_loss,
    gfl_loss,
    gfl_simple_test,
    integral_distance,
    quality_focal_loss,
)
from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg

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
            gt_boxes[i, j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
            gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
            gt_valid[i, j] = True
    return {"image": jnp.asarray(images),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_labels": jnp.asarray(gt_labels),
            "gt_valid": jnp.asarray(gt_valid)}


@pytest.fixture(scope="module")
def gfl():
    model = GFL(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_integral_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(12, 4 * 17).astype(np.float32)
    ours = np.asarray(integral_distance(jnp.asarray(x), 16))
    t = F.softmax(torch.from_numpy(x).reshape(-1, 17), dim=1)
    ref = F.linear(t, torch.linspace(0, 16, 17)).reshape(-1, 4).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_dfl_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    pred = rng.randn(40, 17).astype(np.float32)
    label = rng.uniform(0, 15.9, 40).astype(np.float32)
    ours = np.asarray(distribution_focal_loss(
        jnp.asarray(pred), jnp.asarray(label)))
    tp, tl = torch.from_numpy(pred), torch.from_numpy(label)
    dl = tl.long()
    dr = dl + 1
    wl = dr.float() - tl
    wr = tl - dl.float()
    ref = (F.cross_entropy(tp, dl, reduction="none") * wl
           + F.cross_entropy(tp, dr, reduction="none") * wr).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_qfl_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    n, c = 64, NUM_CLASSES
    pred = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c + 1, n)          # c = background
    score = np.where(labels < c, rng.uniform(0.1, 1, n), 0.0) \
        .astype(np.float32)
    ours = np.asarray(quality_focal_loss(
        jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(score)))

    tp = torch.from_numpy(pred)
    tlab = torch.from_numpy(labels)
    tsc = torch.from_numpy(score)
    psig = tp.sigmoid()
    loss = F.binary_cross_entropy_with_logits(
        tp, torch.zeros_like(tp), reduction="none") * psig.pow(2)
    pos = ((tlab >= 0) & (tlab < c)).nonzero().squeeze(1)
    pl = tlab[pos].long()
    sf = tsc[pos] - psig[pos, pl]
    loss[pos, pl] = F.binary_cross_entropy_with_logits(
        tp[pos, pl], tsc[pos], reduction="none") * sf.abs().pow(2)
    ref = loss.sum(dim=1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bbox2distance_clamps():
    pts = jnp.asarray([[10.0, 10.0]])
    box = jnp.asarray([[0.0, 0.0, 100.0, 100.0]])
    d = np.asarray(bbox2distance(pts, box, 16))
    assert d.max() <= 15.9 + 1e-6
    assert d.min() >= 0


def test_gfl_loss_finite_and_learns_signal(gfl):
    model, variables = gfl
    batch = _demo_inputs()
    total, losses, aux = gfl_loss(model, variables, batch,
                                  jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_dfl"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))
    assert float(losses["loss_cls"]) > 0

    def f(params):
        t, _, _ = gfl_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return t

    grads = jax.grad(f)(variables["params"])
    g = grads["bbox_head"]["gfl_reg"]["kernel"]
    assert float(jnp.abs(g).max()) > 0


def test_gfl_empty_gt(gfl):
    model, variables = gfl
    batch = _demo_inputs()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses, _ = gfl_loss(model, variables, batch,
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(losses["loss_bbox"]) == 0.0


def test_gfl_simple_test_shapes(gfl):
    model, variables = gfl
    batch = _demo_inputs()
    out = gfl_simple_test(model, variables, batch["image"],
                          SSTestCfg(nms_pre=200, max_per_img=20))
    assert out["boxes"].shape == (2, 20, 4)
    assert out["scores"].shape == (2, 20)
    b = np.asarray(out["boxes"])
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()


def test_gfl_build_and_trainer_step():
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model, tr_cfg, te_cfg = build_detector(
        {"type": "GFL", "depth": 18, "num_classes": NUM_CLASSES,
         "frozen_stages": -1})
    assert isinstance(model, GFL)
    trainer = DetectionTrainer(model, None, optax.sgd(1e-3), make_mesh(),
                               train_cfg=SSTrainCfg())
    state = trainer.init_state((H, W, 3))
    batch = _demo_inputs()
    state2, metrics = trainer._train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
