"""ATSS detector: adaptive assigner parity vs the lifted torch oracle,
anchor parity, loss/inference smoke tests, an overfit learning check,
and build_detector dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.atss import (
    ATSS,
    ATSS_DELTA_STDS,
    ATSSHead,
    _anchor_centerness,
    atss_assign,
    atss_loss,
    atss_simple_test,
    make_atss_anchor_generator,
)
from iif_tpu.detection.single_stage import SSTestCfg, ss_fpn_shapes

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8


def _demo_inputs(b=2, seed=0, with_gt=True):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, H, W, 3).astype(np.float32)
    gt_boxes = np.zeros((b, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int64)
    gt_valid = np.zeros((b, MAX_GT), bool)
    if with_gt:
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
def atss():
    model = ATSS(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


# ------------------------------------------------------------------ anchors
def test_atss_anchors_match_torch_oracle():
    from tests.oracles.geometry_oracle import AnchorOracle

    strides = [8, 16, 32, 64, 128]
    ours = make_atss_anchor_generator()
    oracle = AnchorOracle(strides, ratios=(1.0,), scales=(8.0,))
    shapes = ss_fpn_shapes((H, W))
    for g, w in zip(ours.grid_anchors(shapes), oracle.grid_anchors(shapes)):
        np.testing.assert_allclose(g, w.numpy(), rtol=0, atol=1e-4)


# ----------------------------------------------------------------- assigner
def test_atss_assign_matches_torch_oracle():
    """Differential test against the lifted reference assigner, randomized
    over 10 seeds; padded gt slots must not change the result."""
    import torch

    from tests.oracles.geometry_oracle import atss_assign_t

    gen = make_atss_anchor_generator()
    shapes = ss_fpn_shapes((H, W))
    anchors = np.concatenate(gen.grid_anchors(shapes), axis=0)
    level_sizes = [fh * fw for fh, fw in shapes]

    for seed in range(10):
        rng = np.random.RandomState(seed)
        n = rng.randint(1, MAX_GT)
        gts = np.zeros((n, 4), np.float32)
        for j in range(n):
            x1, y1 = rng.uniform(0, W - 20), rng.uniform(0, H - 20)
            w, h = rng.uniform(8, W - x1), rng.uniform(8, H - y1)
            gts[j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
        want = atss_assign_t(torch.from_numpy(anchors),
                             level_sizes, torch.from_numpy(gts)).numpy()

        padded = np.zeros((MAX_GT, 4), np.float32)
        padded[:n] = gts
        valid = np.zeros(MAX_GT, bool)
        valid[:n] = True
        got = np.asarray(atss_assign(
            jnp.asarray(anchors), level_sizes, jnp.asarray(padded),
            jnp.asarray(valid)))
        np.testing.assert_array_equal(got, want, err_msg=f"seed {seed}")


def test_atss_assign_empty_gt():
    gen = make_atss_anchor_generator()
    shapes = ss_fpn_shapes((H, W))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    level_sizes = [fh * fw for fh, fw in shapes]
    got = atss_assign(anchors, level_sizes,
                      jnp.zeros((MAX_GT, 4)), jnp.zeros(MAX_GT, bool))
    assert int(jnp.abs(got).sum()) == 0      # everything background


# --------------------------------------------------------------- centerness
def test_anchor_centerness_golden():
    """Anchor centered on the gt -> centerness 1; quarter-offset anchor
    matches the closed form sqrt((min/max)_lr * (min/max)_tb)."""
    gt = jnp.asarray([[0.0, 0.0, 64.0, 64.0], [0.0, 0.0, 64.0, 64.0]])
    anchors = jnp.asarray([[28.0, 28.0, 36.0, 36.0],     # center (32, 32)
                           [12.0, 28.0, 20.0, 36.0]])    # center (16, 32)
    ctr = np.asarray(_anchor_centerness(anchors, gt))
    np.testing.assert_allclose(ctr[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(ctr[1], np.sqrt(16.0 / 48.0), rtol=1e-6)


# ------------------------------------------------------------- head/forward
def test_atss_forward_shapes(atss):
    model, variables = atss
    cls_scores, bbox_preds, ctrs = model.apply(
        variables, jnp.zeros((2, H, W, 3)), False)
    assert len(cls_scores) == 5
    for s, d, ct, (fh, fw) in zip(cls_scores, bbox_preds, ctrs,
                                  ss_fpn_shapes((H, W))):
        assert s.shape == (2, fh, fw, NUM_CLASSES)     # 1 anchor/cell
        assert d.shape == (2, fh, fw, 4)
        assert ct.shape == (2, fh, fw, 1)


def test_atss_cls_bias_prior(atss):
    _, variables = atss
    bias = np.asarray(variables["params"]["bbox_head"]["atss_cls"]["bias"])
    np.testing.assert_allclose(1 / (1 + np.exp(-bias)), 0.01, atol=1e-6)


# -------------------------------------------------------------------- loss
def test_atss_loss_positive_and_grads(atss):
    model, variables = atss
    batch = _demo_inputs()

    def f(params):
        total, losses, _ = atss_loss(
            model, {"params": params,
                    "batch_stats": variables.get("batch_stats", {})},
            batch, jax.random.PRNGKey(0))
        return total, losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(losses[k])) and float(losses[k]) >= 0
    assert float(losses["loss_cls"]) > 0
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    assert "scale_0" in grads["bbox_head"]


def test_atss_loss_empty_gt(atss):
    model, variables = atss
    batch = _demo_inputs(with_gt=False)
    total, losses, _ = atss_loss(model, variables, batch,
                                 jax.random.PRNGKey(0))
    assert float(losses["loss_bbox"]) == 0.0
    assert float(losses["loss_centerness"]) == 0.0
    assert np.isfinite(float(losses["loss_cls"]))


# --------------------------------------------------------------- inference
def test_atss_simple_test_shapes(atss):
    model, variables = atss
    cfg = SSTestCfg(nms_pre=200, max_per_img=15)
    out = atss_simple_test(model, variables, jnp.zeros((2, H, W, 3)), cfg)
    assert out["boxes"].shape == (2, 15, 4)
    assert out["scores"].shape == (2, 15)
    assert out["valid"].shape == (2, 15)


# ---------------------------------------------------------------- learning
def test_atss_overfits_one_box():
    import optax

    model = ATSS(num_classes=2, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    rng = np.random.RandomState(3)
    img = rng.randn(1, H, W, 3).astype(np.float32)
    img[0, 32:96, 24:104] += 2.0
    batch = {
        "image": jnp.asarray(img),
        "gt_boxes": jnp.asarray([[[24.0, 32.0, 104.0, 96.0]]
                                 + [[0.0] * 4] * (MAX_GT - 1)]),
        "gt_labels": jnp.zeros((1, MAX_GT), jnp.int32),
        "gt_valid": jnp.asarray([[True] + [False] * (MAX_GT - 1)]),
    }
    tx = optax.adam(1e-3)
    params = variables["params"]
    bs0 = variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def f(p):
            total, _, _ = atss_loss(
                model, {"params": p, "batch_stats": bs0}, batch,
                jax.random.PRNGKey(0))
            return total

        loss, g = jax.value_and_grad(f)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(80):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first
    out = atss_simple_test(
        model, {"params": params, "batch_stats": bs0},
        batch["image"], SSTestCfg(nms_pre=200, max_per_img=10))
    assert bool(out["valid"][0, 0])
    top = np.asarray(out["boxes"][0, 0])
    gt = np.array([24.0, 32.0, 104.0, 96.0])
    ix1, iy1 = np.maximum(top[:2], gt[:2])
    ix2, iy2 = np.minimum(top[2:], gt[2:])
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    union = ((top[2] - top[0]) * (top[3] - top[1])
             + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
    assert inter / union > 0.3


# ------------------------------------------------------------------ factory
def test_build_detector_dispatch_atss():
    from iif_tpu.detection import build_detector
    from iif_tpu.detection.single_stage import SSTrainCfg

    m, tr, te = build_detector({"type": "ATSS", "num_classes": 4,
                                "depth": 18, "with_mask": False})
    assert isinstance(m, ATSS) and tr is SSTrainCfg and te is SSTestCfg
