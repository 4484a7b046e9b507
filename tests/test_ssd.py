"""SSD300: anchor schedule goldens, VGG/neck feature-map shapes,
hard-negative-mining loss properties, inference smoke, learning-direction
check, and build_detector dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg
from iif_tpu.detection.ssd import (
    SSD,
    SSD300_FEAT_SIZES,
    SSD_STRIDES,
    SSD_TEST_CFG,
    ssd_grid_anchors,
    ssd_loss,
    ssd_min_max_sizes,
    ssd_simple_test,
)

S = 300
NUM_CLASSES = 6
MAX_GT = 8

SSD_TRAIN_CFG = SSTrainCfg(pos_iou_thr=0.5, neg_iou_thr=0.5,
                           min_pos_iou=0.0)


def _demo_inputs(b=1, seed=0, with_gt=True):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, S, S, 3).astype(np.float32)
    gt_boxes = np.zeros((b, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int64)
    gt_valid = np.zeros((b, MAX_GT), bool)
    if with_gt:
        for i in range(b):
            n = rng.randint(1, 4)
            for j in range(n):
                x1, y1 = rng.randint(0, S - 120), rng.randint(0, S - 120)
                w, h = rng.randint(60, 120), rng.randint(60, 120)
                gt_boxes[i, j] = [x1, y1, min(x1 + w, S), min(y1 + h, S)]
                gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
                gt_valid[i, j] = True
    return {"image": jnp.asarray(images),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_labels": jnp.asarray(gt_labels),
            "gt_valid": jnp.asarray(gt_valid)}


@pytest.fixture(scope="module")
def ssd():
    model = SSD(num_classes=NUM_CLASSES)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), False)
    return model, variables


# ------------------------------------------------------------------ anchors
def test_ssd_size_schedule_golden():
    """SSDAnchorGenerator's hard-coded 300/(0.15, 0.9) schedule
    (``anchor_generator.py:497-518``)."""
    mins, maxs = ssd_min_max_sizes(300)
    assert mins == [21, 45, 99, 153, 207, 261]
    assert maxs == [45, 99, 153, 207, 261, 315]


def test_ssd_anchor_counts_and_values():
    anchors = ssd_grid_anchors(300)
    counts = [a.shape[0] for a in anchors]
    assert counts == [38 * 38 * 4, 19 * 19 * 6, 10 * 10 * 6,
                      5 * 5 * 6, 3 * 3 * 4, 1 * 4]
    # level 0, first cell (center (4, 4)): [min-square 21, sqrt(21*45)
    # square, then the (1/r, r) pair at min size] — the reference builds
    # anchor_ratio = [1, 1/r, r] and index_selects [0, len, 1, 2...], so
    # slot 2 is ratio 1/2 (wide) and slot 3 ratio 2 (tall); mmdet ratio
    # is h/w
    a0 = anchors[0][:4]
    w = a0[:, 2] - a0[:, 0]
    h = a0[:, 3] - a0[:, 1]
    np.testing.assert_allclose(w[0], 21.0, rtol=1e-6)
    np.testing.assert_allclose(h[0], 21.0, rtol=1e-6)
    np.testing.assert_allclose(w[1], np.sqrt(21.0 * 45.0), rtol=1e-6)
    np.testing.assert_allclose(w[2], 21.0 * np.sqrt(2.0), rtol=1e-6)
    np.testing.assert_allclose(h[2], 21.0 / np.sqrt(2.0), rtol=1e-6)
    np.testing.assert_allclose(w[3], 21.0 / np.sqrt(2.0), rtol=1e-6)
    np.testing.assert_allclose(h[3], 21.0 * np.sqrt(2.0), rtol=1e-6)
    # centers at stride/2
    cx = (a0[:, 0] + a0[:, 2]) / 2
    np.testing.assert_allclose(cx, 4.0, rtol=1e-6)
    # last level: one cell, center 150
    aL = anchors[-1]
    np.testing.assert_allclose((aL[:, 0] + aL[:, 2]) / 2, 150.0, rtol=1e-6)


# ------------------------------------------------------------------- shapes
def test_ssd_feature_shapes(ssd):
    model, variables = ssd
    feats = model.apply(variables, jnp.zeros((1, S, S, 3)), False,
                        method=SSD.extract_feat)
    assert [f.shape[1] for f in feats] == list(SSD300_FEAT_SIZES)
    assert [f.shape[-1] for f in feats] == [512, 1024, 512, 256, 256, 256]


def test_ssd_head_shapes(ssd):
    model, variables = ssd
    cls_scores, bbox_preds = model.apply(
        variables, jnp.zeros((1, S, S, 3)), False)
    for s, d, a, fs in zip(cls_scores, bbox_preds, (4, 6, 6, 6, 4, 4),
                           SSD300_FEAT_SIZES):
        assert s.shape == (1, fs, fs, a * (NUM_CLASSES + 1))
        assert d.shape == (1, fs, fs, a * 4)


def test_ssd_l2norm_unit_scale(ssd):
    """conv4_3 is L2-normalized then scaled: with scale param s=20 the
    per-position channel norm equals 20."""
    model, variables = ssd
    feats = model.apply(variables, jnp.ones((1, S, S, 3)), False,
                        method=SSD.extract_feat)
    norms = np.sqrt(np.asarray((feats[0] ** 2).sum(-1)))
    np.testing.assert_allclose(norms, 20.0, rtol=1e-3)


# -------------------------------------------------------------------- loss
def test_ssd_loss_positive_and_grads(ssd):
    model, variables = ssd
    batch = _demo_inputs()

    def f(params):
        total, losses, _ = ssd_loss(model, {"params": params}, batch,
                                    jax.random.PRNGKey(0), SSD_TRAIN_CFG)
        return total, losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    assert float(losses["loss_cls"]) > 0
    assert float(losses["loss_bbox"]) > 0
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_ssd_loss_empty_gt_is_zero_cls(ssd):
    """No positives -> hard-negative budget 3*0 = 0 -> cls loss exactly 0
    (the reference's num_neg_samples topk(0) behavior)."""
    model, variables = ssd
    batch = _demo_inputs(with_gt=False)
    total, losses, _ = ssd_loss(model, variables, batch,
                                jax.random.PRNGKey(0), SSD_TRAIN_CFG)
    assert float(losses["loss_cls"]) == 0.0
    assert float(losses["loss_bbox"]) == 0.0


# --------------------------------------------------------------- inference
def test_ssd_simple_test_shapes(ssd):
    model, variables = ssd
    out = ssd_simple_test(model, variables, jnp.zeros((1, S, S, 3)),
                          SSD_TEST_CFG)
    assert out["boxes"].shape == (1, 200, 4)
    assert out["scores"].shape == (1, 200)
    assert out["valid"].shape == (1, 200)


# ---------------------------------------------------------------- learning
def test_ssd_loss_decreases():
    """A dozen adam steps on one synthetic box reduce the loss (full
    overfit is too slow for VGG16@300 on the CPU suite)."""
    import optax

    model = SSD(num_classes=2)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), False)
    rng = np.random.RandomState(3)
    img = rng.randn(1, S, S, 3).astype(np.float32)
    img[0, 60:240, 50:250] += 2.0
    batch = {
        "image": jnp.asarray(img),
        "gt_boxes": jnp.asarray([[[50.0, 60.0, 250.0, 240.0]]
                                 + [[0.0] * 4] * (MAX_GT - 1)]),
        "gt_labels": jnp.zeros((1, MAX_GT), jnp.int32),
        "gt_valid": jnp.asarray([[True] + [False] * (MAX_GT - 1)]),
    }
    tx = optax.adam(1e-3)
    params = variables["params"]
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def f(p):
            total, _, _ = ssd_loss(model, {"params": p}, batch,
                                   jax.random.PRNGKey(0), SSD_TRAIN_CFG)
            return total

        loss, g = jax.value_and_grad(f)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(12):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.8 * first


# ------------------------------------------------------------------ factory
def test_build_detector_dispatch_ssd():
    from iif_tpu.detection import build_detector

    m, tr, te = build_detector({"type": "SSD", "num_classes": 4,
                                "with_mask": False})
    assert isinstance(m, SSD) and m.input_size == 300
    assert tr is SSTrainCfg and te is SSTestCfg
