"""CenterNet: gaussian radius golden vs the reference formulas, target
map goldens (center==1, wh/offset at the center cell), loss smoke,
decode round-trip, overfit learning check, and dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.centernet import (
    CENTERNET_TEST_CFG,
    CenterNet,
    centernet_loss,
    centernet_simple_test,
    centernet_targets,
    gaussian_focal_loss,
    gaussian_radius,
)
from iif_tpu.detection.single_stage import SSTestCfg

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8


def _demo_inputs(b=1, seed=0, with_gt=True):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, H, W, 3).astype(np.float32)
    gt_boxes = np.zeros((b, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int64)
    gt_valid = np.zeros((b, MAX_GT), bool)
    if with_gt:
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


@pytest.fixture(scope="module")
def cnet():
    model = CenterNet(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                      norm_eval=False)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


# ------------------------------------------------------------------ radius
def test_gaussian_radius_matches_reference_formula():
    """Against a direct transcription of gaussian_target.py:68-178."""
    from math import sqrt

    def ref(h, w, mo=0.3):
        a1, b1 = 1, h + w
        c1 = w * h * (1 - mo) / (1 + mo)
        r1 = (b1 - sqrt(b1 ** 2 - 4 * a1 * c1)) / (2 * a1)
        a2, b2, c2 = 4, 2 * (h + w), (1 - mo) * w * h
        r2 = (b2 - sqrt(b2 ** 2 - 4 * a2 * c2)) / (2 * a2)
        a3, b3 = 4 * mo, -2 * mo * (h + w)
        c3 = (mo - 1) * w * h
        r3 = (-b3 + sqrt(b3 ** 2 - 4 * a3 * c3)) / (2 * a3)
        return min(r1, r2, r3)

    for h, w in ((10.0, 10.0), (4.0, 20.0), (32.0, 7.0), (1.0, 1.0)):
        got = float(gaussian_radius(jnp.asarray(h), jnp.asarray(w)))
        np.testing.assert_allclose(got, ref(h, w), rtol=1e-5)


# ----------------------------------------------------------------- targets
def test_centernet_targets_golden():
    """One 32x32 gt at image (32..64, 32..64): feat (stride 4) center
    (12, 12) has heatmap exactly 1 on its class, wh (8, 8), offset 0,
    weight 1; other classes stay zero."""
    gtb = jnp.asarray([[32.0, 32.0, 64.0, 64.0]]
                      + [[0.0] * 4] * (MAX_GT - 1))
    gtl = jnp.asarray([2] + [0] * (MAX_GT - 1))
    gtv = jnp.asarray([True] + [False] * (MAX_GT - 1))
    hm, wh, off, wt = centernet_targets(gtb, gtl, gtv, NUM_CLASSES,
                                        (H // 4, W // 4), (H, W))
    hm, wh, off, wt = map(np.asarray, (hm, wh, off, wt))
    assert hm[2, 12, 12] == 1.0
    assert hm[0].max() == 0.0 and hm[5].max() == 0.0
    np.testing.assert_allclose(wh[12, 12], [8.0, 8.0])
    np.testing.assert_allclose(off[12, 12], [0.0, 0.0])
    assert wt[12, 12] == 1.0 and wt.sum() == 1.0
    # gaussian decays monotonically from the center
    assert 0 < hm[2, 12, 13] < 1.0
    assert hm[2, 12, 14] < hm[2, 12, 13]


def test_centernet_targets_empty():
    hm, wh, off, wt = centernet_targets(
        jnp.zeros((MAX_GT, 4)), jnp.zeros(MAX_GT, jnp.int32),
        jnp.zeros(MAX_GT, bool), NUM_CLASSES, (32, 32), (H, W))
    assert float(jnp.abs(hm).sum()) == 0.0
    assert float(wt.sum()) == 0.0


def test_gaussian_focal_loss_values():
    """Perfect prediction at a center -> ~0 loss; confident wrong
    background -> large."""
    t = jnp.asarray([1.0, 0.0])
    good = gaussian_focal_loss(jnp.asarray([0.999, 0.001]), t)
    bad = gaussian_focal_loss(jnp.asarray([0.001, 0.999]), t)
    assert float(good.sum()) < 0.05
    assert float(bad.sum()) > 3.0


# ------------------------------------------------------------------ shapes
def test_centernet_forward_shapes(cnet):
    model, variables = cnet
    heatmap, wh, offset = model.apply(variables,
                                      jnp.zeros((2, H, W, 3)), False)
    assert heatmap.shape == (2, H // 4, W // 4, NUM_CLASSES)
    assert wh.shape == (2, H // 4, W // 4, 2)
    assert offset.shape == (2, H // 4, W // 4, 2)
    hm = np.asarray(heatmap)
    assert (hm >= 0).all() and (hm <= 1).all()
    # bias prior: initial heatmap ~0.1
    np.testing.assert_allclose(hm.mean(), 0.1, atol=0.05)


# -------------------------------------------------------------------- loss
def test_centernet_loss_positive_and_grads(cnet):
    model, variables = cnet
    batch = _demo_inputs()

    def f(params):
        total, losses, _ = centernet_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return total, losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    for k in ("loss_center_heatmap", "loss_wh", "loss_offset"):
        assert np.isfinite(float(losses[k])) and float(losses[k]) >= 0
    assert float(losses["loss_center_heatmap"]) > 0
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_centernet_loss_empty_gt(cnet):
    model, variables = cnet
    batch = _demo_inputs(with_gt=False)
    total, losses, _ = centernet_loss(model, variables, batch,
                                      jax.random.PRNGKey(0))
    assert float(losses["loss_wh"]) == 0.0
    assert float(losses["loss_offset"]) == 0.0
    assert np.isfinite(float(losses["loss_center_heatmap"]))


# ----------------------------------------------------------------- decode
def test_centernet_decode_roundtrip(cnet):
    """Inject a synthetic peak into the head outputs path by checking
    the decode math on the real forward: shapes + coordinate scaling."""
    model, variables = cnet
    out = centernet_simple_test(model, variables,
                                jnp.zeros((1, H, W, 3)),
                                CENTERNET_TEST_CFG)
    assert out["boxes"].shape == (1, 100, 4)
    assert out["scores"].shape == (1, 100)
    assert out["labels"].shape == (1, 100)
    # scores descend (global top-k)
    s = np.asarray(out["scores"][0])
    assert (np.diff(s) <= 1e-6).all()


# ---------------------------------------------------------------- learning
def test_centernet_overfits_one_box():
    import optax

    model = CenterNet(num_classes=2, depth=18, frozen_stages=-1,
                      norm_eval=False)
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
    bs = variables["batch_stats"]
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt):
        def f(p):
            total, _, aux = centernet_loss(
                model, {"params": p, "batch_stats": bs}, batch,
                jax.random.PRNGKey(0))
            return total, aux

        (loss, aux), g = jax.value_and_grad(f, has_aux=True)(params)
        upd, opt = tx.update(g, opt)
        return (optax.apply_updates(params, upd), aux["batch_stats"],
                opt, loss)

    first = None
    for _ in range(150):
        params, bs, opt, loss = step(params, bs, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first

    @jax.jit
    def refresh(bs):
        _, mut = model.apply({"params": params, "batch_stats": bs},
                             batch["image"], True,
                             mutable=["batch_stats"])
        return mut["batch_stats"]

    for _ in range(40):
        bs = refresh(bs)
    out = centernet_simple_test(
        model, {"params": params, "batch_stats": bs}, batch["image"],
        SSTestCfg(score_thr=0.0, max_per_img=10))
    gt = np.array([24.0, 32.0, 104.0, 96.0])
    best = 0.0
    for k in range(5):
        top = np.asarray(out["boxes"][0, k])
        ix1, iy1 = np.maximum(top[:2], gt[:2])
        ix2, iy2 = np.minimum(top[2:], gt[2:])
        inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
        union = ((top[2] - top[0]) * (top[3] - top[1])
                 + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
        best = max(best, inter / max(union, 1e-6))
    assert best > 0.3


# ------------------------------------------------------------------ factory
def test_build_detector_dispatch_centernet():
    from iif_tpu.detection import build_detector

    m, tr, te = build_detector({"type": "CenterNet", "num_classes": 4,
                                "depth": 18, "with_mask": False,
                                "frozen_stages": -1, "norm_eval": False})
    assert isinstance(m, CenterNet)
    assert te is SSTestCfg
