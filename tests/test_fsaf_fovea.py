"""FSAF and FoveaBox detectors: assigner/target parity vs lifted torch
oracles, TBLR coder parity, loss/inference smoke, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.fovea import (
    BASE_EDGES,
    SCALE_RANGES,
    FoveaBox,
    fovea_loss,
    fovea_simple_test,
    fovea_targets_level,
)
from iif_tpu.detection.fsaf import (
    FSAF,
    center_region_assign,
    fsaf_loss,
    fsaf_simple_test,
    make_fsaf_anchor_generator,
    tblr2bboxes,
)
from iif_tpu.detection.single_stage import SS_STRIDES, SSTestCfg, ss_fpn_shapes

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


# ----------------------------------------------------------------- FSAF
def test_tblr_decode_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    priors = np.zeros((32, 4), np.float32)
    priors[:, :2] = rng.uniform(0, 100, (32, 2))
    priors[:, 2:] = priors[:, :2] + rng.uniform(4, 64, (32, 2))
    tblr = np.abs(rng.randn(32, 4)).astype(np.float32)
    ours = np.asarray(tblr2bboxes(jnp.asarray(priors), jnp.asarray(tblr)))

    tp, tt = torch.from_numpy(priors), torch.from_numpy(tblr)
    loc = tt * 4.0
    cx = (tp[:, 0] + tp[:, 2]) / 2
    cy = (tp[:, 1] + tp[:, 3]) / 2
    w = tp[:, 2] - tp[:, 0]
    h = tp[:, 3] - tp[:, 1]
    top, bottom = loc[:, 0] * h, loc[:, 1] * h
    left, right = loc[:, 2] * w, loc[:, 3] * w
    ref = torch.stack([cx - left, cy - top, cx + right, cy + bottom],
                      dim=1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_center_region_assign_matches_oracle():
    import torch

    from tests.oracles.geometry_oracle import center_region_assign_t

    gen = make_fsaf_anchor_generator()
    shapes = ss_fpn_shapes((H, W))
    anchors = np.concatenate(gen.grid_anchors(shapes), axis=0) \
        .astype(np.float32)
    for seed in range(10):
        rng = np.random.RandomState(seed)
        g = rng.randint(1, 6)
        gtb = np.zeros((g, 4), np.float32)
        gtb[:, :2] = rng.uniform(0, W - 50, (g, 2))
        gtb[:, 2:] = gtb[:, :2] + rng.uniform(20, 50, (g, 2))
        gtb = np.clip(gtb, 0, W)
        gtl = rng.randint(0, NUM_CLASSES, g)

        ref_assigned, ref_shadow = center_region_assign_t(
            torch.from_numpy(anchors), torch.from_numpy(gtb),
            torch.from_numpy(gtl))

        # padded-gt formulation must match
        gtb_p = np.zeros((MAX_GT, 4), np.float32)
        gtb_p[:g] = gtb
        gtv = np.zeros(MAX_GT, bool)
        gtv[:g] = True
        ours_assigned, ours_shadow = center_region_assign(
            jnp.asarray(anchors), jnp.asarray(gtb_p), jnp.asarray(gtv))
        np.testing.assert_array_equal(np.asarray(ours_assigned),
                                      ref_assigned.numpy())
        ref_mat = np.zeros((anchors.shape[0], MAX_GT), bool)
        for a, gi in ref_shadow.numpy():
            ref_mat[a, gi - 1] = True
        np.testing.assert_array_equal(np.asarray(ours_shadow), ref_mat)


@pytest.fixture(scope="module")
def fsaf():
    model = FSAF(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_fsaf_loss_and_test(fsaf):
    model, variables = fsaf
    batch = _demo_inputs()
    total, losses, _ = fsaf_loss(model, variables, batch,
                                 jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))
    out = fsaf_simple_test(model, variables, batch["image"],
                           SSTestCfg(nms_pre=200, max_per_img=20))
    assert out["boxes"].shape == (2, 20, 4)
    b = np.asarray(out["boxes"])
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()


def test_fsaf_empty_gt(fsaf):
    model, variables = fsaf
    batch = _demo_inputs()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses, _ = fsaf_loss(model, variables, batch,
                                 jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(losses["loss_bbox"]) == 0.0


def test_fsaf_online_selection_single_level():
    """Each gt's reg gradient flows through exactly one pyramid level:
    with one small gt, the kept positive count equals the positives of
    the argmin level only."""
    model = FSAF(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    batch = _demo_inputs(b=1, seed=3)
    total, losses, _ = fsaf_loss(model, variables, batch,
                                 jax.random.PRNGKey(0))
    assert np.isfinite(float(total))


# ----------------------------------------------------------------- Fovea
def test_fovea_targets_match_oracle():
    import torch

    from tests.oracles.geometry_oracle import fovea_targets_t

    shapes = ss_fpn_shapes((H, W))
    for seed in range(10):
        rng = np.random.RandomState(seed)
        g = rng.randint(1, 6)
        gtb = np.zeros((g, 4), np.float32)
        gtb[:, :2] = rng.uniform(0, W - 60, (g, 2))
        gtb[:, 2:] = gtb[:, :2] + rng.uniform(8, 60, (g, 2))
        gtb = np.clip(gtb, 0, W)
        gtl = rng.randint(0, NUM_CLASSES, g)
        gtb_p = np.zeros((MAX_GT, 4), np.float32)
        gtb_p[:g] = gtb
        gtv = np.zeros(MAX_GT, bool)
        gtv[:g] = True

        for (fh, fw), stride, base, srange in zip(
                shapes, SS_STRIDES, BASE_EDGES, SCALE_RANGES):
            lab, tgt = fovea_targets_level(
                fh, fw, stride, base, srange, jnp.asarray(gtb_p),
                jnp.asarray(gtl), jnp.asarray(gtv), NUM_CLASSES)
            rl, rt = fovea_targets_t(
                torch.from_numpy(gtb), torch.from_numpy(gtl),
                (fh, fw), stride, base, srange, NUM_CLASSES)
            # the oracle's overwrite order ties differently only when two
            # hit gts have EXACTLY equal area; random floats never tie
            np.testing.assert_array_equal(
                np.asarray(lab).reshape(fh, fw), rl.numpy())
            np.testing.assert_allclose(
                np.asarray(tgt).reshape(fh, fw, 4), rt.numpy(),
                rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def fovea():
    model = FoveaBox(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_fovea_loss_and_test(fovea):
    model, variables = fovea
    batch = _demo_inputs()
    total, losses, _ = fovea_loss(model, variables, batch,
                                  jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_bbox"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0
    out = fovea_simple_test(model, variables, batch["image"],
                            SSTestCfg(nms_pre=200, max_per_img=20))
    assert out["boxes"].shape == (2, 20, 4)


def test_fovea_empty_gt(fovea):
    model, variables = fovea
    batch = _demo_inputs()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses, _ = fovea_loss(model, variables, batch,
                                  jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(losses["loss_bbox"]) == 0.0


def test_build_and_trainer_step_fsaf_fovea():
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    from iif_tpu.detection.single_stage import SSTrainCfg

    for mtype, cls in (("FSAF", FSAF), ("FOVEA", FoveaBox)):
        model, _, _ = build_detector(
            {"type": mtype, "depth": 18, "num_classes": NUM_CLASSES,
             "frozen_stages": -1})
        assert isinstance(model, cls)
        trainer = DetectionTrainer(model, None, optax.sgd(1e-3),
                                   make_mesh(), train_cfg=SSTrainCfg())
        state = trainer.init_state((H, W, 3))
        state2, metrics = trainer._train_step(state, _demo_inputs())
        assert np.isfinite(float(metrics["loss"])), mtype
        assert int(state2.step) == 1
