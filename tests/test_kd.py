"""Localization Distillation: KD-KL parity vs torch F.kl_div, the LD
training step (student learns, teacher frozen), zero-loss self-distill
sanity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.gfl import GFL
from iif_tpu.detection.kd import kd_kl_div, ld_loss

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


def test_kd_kl_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    pred = rng.randn(12, 17).astype(np.float32)
    soft = rng.randn(12, 17).astype(np.float32)
    ours = np.asarray(kd_kl_div(jnp.asarray(pred), jnp.asarray(soft),
                                T=10.0))
    tp, ts = torch.from_numpy(pred), torch.from_numpy(soft)
    ref = (F.kl_div(F.log_softmax(tp / 10, dim=1),
                    F.softmax(ts / 10, dim=1),
                    reduction="none").mean(1) * 100).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_kd_kl_zero_for_identical():
    x = jnp.asarray(np.random.RandomState(1).randn(5, 17),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(kd_kl_div(x, x)), 0.0,
                               atol=1e-5)


def test_ld_loss_runs_and_grads_only_student():
    student = GFL(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    teacher = GFL(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    sv = jax.jit(student.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    tv = jax.jit(teacher.init, static_argnums=(2,))(
        jax.random.PRNGKey(7), jnp.zeros((1, H, W, 3)), False)
    batch = _demo_inputs()
    total, losses, _ = ld_loss(student, sv, teacher, tv, batch,
                               jax.random.PRNGKey(0))
    assert "loss_ld" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))
    assert float(losses["loss_ld"]) > 0

    def f(params):
        t, _, _ = ld_loss(
            student, {"params": params,
                      "batch_stats": sv["batch_stats"]},
            teacher, tv, batch, jax.random.PRNGKey(0))
        return t

    grads = jax.grad(f)(sv["params"])
    g = grads["bbox_head"]["gfl_reg"]["kernel"]
    assert float(jnp.abs(g).max()) > 0

    # self-distillation: identical teacher -> loss_ld == 0
    _, losses_self, _ = ld_loss(student, sv, student, sv, batch,
                                jax.random.PRNGKey(0))
    assert float(losses_self["loss_ld"]) < 1e-5


def test_ld_through_trainer(mesh):
    """configs/ld path: DetectionTrainer(teacher=...) trains the GFL
    student with the distillation loss; the teacher stays frozen."""
    import optax

    from iif_tpu.detection.single_stage import SSTrainCfg
    from iif_tpu.engine.detection import DetectionTrainer

    student = GFL(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    teacher = GFL(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    tvars = jax.jit(teacher.init, static_argnums=2)(
        jax.random.PRNGKey(7), jnp.zeros((1, H, W, 3), jnp.float32),
        False)
    trainer = DetectionTrainer(student, None,
                               optax.sgd(0.005, momentum=0.9), mesh,
                               SSTrainCfg(), teacher=(teacher, tvars))
    state = trainer.init_state((H, W, 3))
    batch = _demo_inputs(b=1)
    state, m0 = trainer._train_step(state, batch)
    for _ in range(5):
        state, m = trainer._train_step(state, batch)
    assert "loss_ld" in m or any("ld" in k for k in m)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
