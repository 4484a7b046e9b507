"""PAA: in-graph GMM parity vs sklearn-style torch EM on synthetic
bimodal data, scheme-(c) separation, loss/inference smoke, score
voting, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.paa import (
    PAA,
    gmm_em_1d,
    paa_loss,
    paa_reassign_single_gt,
    paa_simple_test,
    score_voting,
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


def test_gmm_separates_bimodal():
    rng = np.random.RandomState(0)
    lo = rng.normal(0.5, 0.05, 20)
    hi = rng.normal(3.0, 0.1, 20)
    x = np.sort(np.concatenate([lo, hi])).astype(np.float32)
    comp, score = gmm_em_1d(jnp.asarray(x), jnp.ones(40, bool))
    comp = np.asarray(comp)
    # low-loss cluster = component 0, high-loss = 1, cleanly split
    assert (comp[:20] == 0).all()
    assert (comp[20:] == 1).all()
    assert np.isfinite(np.asarray(score)).all()


def test_gmm_padded_entries_ignored():
    x = np.asarray([0.1, 0.12, 3.0, 3.1, 0.0, 0.0], np.float32)
    valid = np.asarray([1, 1, 1, 1, 0, 0], bool)
    comp, _ = gmm_em_1d(jnp.asarray(x), jnp.asarray(valid))
    comp = np.asarray(comp)
    assert comp[0] == comp[1] == 0
    assert comp[2] == comp[3] == 1


def test_reassign_keeps_low_loss_candidates():
    n = 40
    level_of = jnp.asarray(np.repeat(np.arange(5), 8))
    is_cand = jnp.ones(n, bool)
    # two clusters of loss: anchors 0..9 low, rest high
    loss = np.full(n, 5.0, np.float32)
    loss[:10] = 0.1
    keep = np.asarray(paa_reassign_single_gt(
        jnp.asarray(loss), is_cand, level_of, 5))
    assert keep[:8].any()              # low-loss candidates kept
    assert not keep[loss == 5.0].all() # high-loss cluster not all kept


def test_score_voting_moves_towards_candidates():
    dets = jnp.asarray([[10.0, 10.0, 50.0, 50.0]])
    cand = jnp.asarray([[12.0, 12.0, 52.0, 52.0],
                        [200.0, 200.0, 240.0, 240.0]])
    cand_scores = jnp.asarray([[0.9], [0.9]])
    voted = np.asarray(score_voting(
        dets, jnp.asarray([0.9]), jnp.asarray([0]), cand, cand_scores))
    np.testing.assert_allclose(voted[0], [12, 12, 52, 52], atol=1e-3)


@pytest.fixture(scope="module")
def paa():
    model = PAA(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_paa_loss(paa):
    model, variables = paa
    batch = _demo_inputs()
    total, losses, _ = paa_loss(model, variables, batch,
                                jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_bbox", "loss_iou"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))
    assert float(losses["loss_cls"]) > 0


def test_paa_empty_gt(paa):
    model, variables = paa
    batch = _demo_inputs()
    batch["gt_valid"] = jnp.zeros_like(batch["gt_valid"])
    total, losses, _ = paa_loss(model, variables, batch,
                                jax.random.PRNGKey(0))
    assert np.isfinite(float(total))
    assert float(losses["loss_bbox"]) == 0.0


def test_paa_simple_test_and_build(paa):
    model, variables = paa
    batch = _demo_inputs()
    out = paa_simple_test(model, variables, batch["image"],
                          SSTestCfg(nms_pre=200, max_per_img=20))
    assert out["boxes"].shape == (2, 20, 4)

    from iif_tpu.detection import build_detector
    from iif_tpu.detection.single_stage import single_stage_loss_fn

    m, _, _ = build_detector({"type": "PAA", "depth": 18,
                              "num_classes": NUM_CLASSES})
    assert isinstance(m, PAA)
    assert single_stage_loss_fn(m).__name__ == "paa_loss"
