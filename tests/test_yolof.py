"""YOLOF: uniform-matching parity vs the lifted torch oracle (10 seeds,
incl. the duplicate-scatter last-write order), ctr-clamped decode,
implicit-objectness math, loss/inference smoke, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.single_stage import SSTestCfg
from iif_tpu.detection.yolof import (
    YOLOF,
    DilatedEncoderNeck,
    delta2bbox_ctr_clamp,
    make_yolof_anchor_generator,
    uniform_match,
    yolof_loss,
    yolof_simple_test,
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
            gt_boxes[i, j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
            gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
            gt_valid[i, j] = True
    return {"image": jnp.asarray(images),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_labels": jnp.asarray(gt_labels),
            "gt_valid": jnp.asarray(gt_valid)}


def test_uniform_match_parity_10_seeds():
    import torch

    from tests.oracles.geometry_oracle import uniform_assign_t

    gen = make_yolof_anchor_generator()
    base_anchors = gen.grid_anchors([(4, 4)])[0].astype(np.float32)
    n = base_anchors.shape[0]
    for seed in range(10):
        rng = np.random.RandomState(seed)
        # jitter the regular grid: exact L1-cost ties on a symmetric
        # grid are tie-broken differently by torch.topk(largest=False)
        # and lax.top_k — both valid; parity is only defined off ties
        anchors = base_anchors + rng.uniform(
            -0.25, 0.25, base_anchors.shape).astype(np.float32)
        g = rng.randint(1, 6)
        gtb = np.zeros((g, 4), np.float32)
        gtb[:, :2] = rng.uniform(0, W - 50, (g, 2))
        gtb[:, 2:] = gtb[:, :2] + rng.uniform(16, 64, (g, 2))
        pred = np.zeros((n, 4), np.float32)
        pred[:, :2] = rng.uniform(-10, W, (n, 2))
        pred[:, 2:] = pred[:, :2] + rng.uniform(8, 80, (n, 2))

        ref_assigned, ref_pos, ref_idx, ref_gt = uniform_assign_t(
            torch.from_numpy(pred), torch.from_numpy(anchors),
            torch.from_numpy(gtb))

        gtb_p = np.zeros((g, 4), np.float32)   # exact-G (no padding) run
        gtb_p[:] = gtb
        ours_assigned, midx, mgt, ppos = uniform_match(
            jnp.asarray(pred), jnp.asarray(anchors), jnp.asarray(gtb_p),
            jnp.ones(g, bool))
        np.testing.assert_array_equal(np.asarray(ours_assigned),
                                      ref_assigned.numpy())
        np.testing.assert_array_equal(np.asarray(midx), ref_idx.numpy())
        np.testing.assert_array_equal(np.asarray(mgt), ref_gt.numpy())
        np.testing.assert_array_equal(np.asarray(ppos), ref_pos.numpy())


def test_uniform_match_padded_gt_invariant():
    """Padded gt slots must not affect assignment of real anchors."""
    gen = make_yolof_anchor_generator()
    anchors = gen.grid_anchors([(4, 4)])[0].astype(np.float32)
    rng = np.random.RandomState(0)
    n = anchors.shape[0]
    g = 3
    gtb = np.zeros((g, 4), np.float32)
    gtb[:, :2] = rng.uniform(0, W - 50, (g, 2))
    gtb[:, 2:] = gtb[:, :2] + rng.uniform(16, 64, (g, 2))
    pred = np.zeros((n, 4), np.float32)
    pred[:, :2] = rng.uniform(-10, W, (n, 2))
    pred[:, 2:] = pred[:, :2] + rng.uniform(8, 80, (n, 2))

    a1, _, _, _ = uniform_match(jnp.asarray(pred), jnp.asarray(anchors),
                                jnp.asarray(gtb), jnp.ones(g, bool))
    gtb_pad = np.zeros((MAX_GT, 4), np.float32)
    gtb_pad[:g] = gtb
    valid = np.zeros(MAX_GT, bool)
    valid[:g] = True
    a2, _, _, p2 = uniform_match(jnp.asarray(pred), jnp.asarray(anchors),
                                 jnp.asarray(gtb_pad), jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    # no padded pair survives the pos filter
    mgt = np.tile(np.arange(MAX_GT), 8)
    assert not np.asarray(p2)[mgt >= g].any()


def test_ctr_clamp_decode():
    anchors = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
    # huge center delta: clamped to +-32 px
    deltas = jnp.asarray([[10.0, -10.0, 0.0, 0.0]])
    box = np.asarray(delta2bbox_ctr_clamp(anchors, deltas))[0]
    cx = (box[0] + box[2]) / 2
    cy = (box[1] + box[3]) / 2
    assert abs(cx - (32 + 32)) < 1e-4
    assert abs(cy - (32 - 32)) < 1e-4


def test_dilated_encoder_shapes():
    neck = DilatedEncoderNeck()
    x = jnp.zeros((1, 8, 8, 512))
    variables = neck.init(jax.random.PRNGKey(0), x, False)
    out = neck.apply(variables, x, False)
    assert out.shape == (1, 8, 8, 512)
    assert "batch_stats" in variables


@pytest.fixture(scope="module")
def yolof():
    model = YOLOF(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_yolof_loss_and_test(yolof):
    model, variables = yolof
    batch = _demo_inputs()
    total, losses, aux = yolof_loss(model, variables, batch,
                                    jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))
    assert aux["batch_stats"]
    out = yolof_simple_test(model, variables, batch["image"],
                            SSTestCfg(nms_pre=64, max_per_img=20,
                                      nms_iou=0.6))
    assert out["boxes"].shape == (2, 20, 4)


def test_yolof_empty_gt(yolof):
    model, variables = yolof
    batch = _demo_inputs()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses, _ = yolof_loss(model, variables, batch,
                                  jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(losses["loss_bbox"]) == 0.0


def test_yolof_build_and_trainer_step():
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    from iif_tpu.detection.single_stage import SSTrainCfg

    model, _, _ = build_detector(
        {"type": "YOLOF", "depth": 18, "num_classes": NUM_CLASSES,
         "frozen_stages": -1})
    assert isinstance(model, YOLOF)
    trainer = DetectionTrainer(model, None, optax.sgd(1e-3), make_mesh(),
                               train_cfg=SSTrainCfg())
    state = trainer.init_state((H, W, 3))
    state2, metrics = trainer._train_step(state, _demo_inputs())
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
