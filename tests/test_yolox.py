"""YOLOX: SimOTA parity vs the lifted torch oracle, CSPDarknet/PAFPN
shapes, decode round-trip, loss/inference smoke, overfit learning check,
and build_detector dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.single_stage import SSTestCfg
from iif_tpu.detection.yolox import (
    YOLOX,
    YOLOX_TEST_CFG,
    CSPDarknet,
    YOLOXPAFPN,
    sim_ota_assign,
    yolox_decode,
    yolox_loss,
    yolox_priors,
    yolox_simple_test,
)

H = W = 128          # 3 levels: 16x16 + 8x8 + 4x4 = 336 priors
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
def yolox():
    model = YOLOX(num_classes=NUM_CLASSES)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


# ----------------------------------------------------------------- priors
def test_yolox_priors():
    pr = yolox_priors((H, W))
    assert pr.shape == (16 * 16 + 8 * 8 + 4 * 4, 4)
    np.testing.assert_allclose(pr[0], [0, 0, 8, 8])
    np.testing.assert_allclose(pr[1], [8, 0, 8, 8])
    np.testing.assert_allclose(pr[-1], [96, 96, 32, 32])


def test_yolox_decode_roundtrip():
    """decode(priors, [dxy, log wh]) reproduces the closed form."""
    pr = jnp.asarray([[16.0, 24.0, 8.0, 8.0]])
    pred = jnp.asarray([[0.5, -0.25, np.log(4.0), np.log(2.0)]])
    out = np.asarray(yolox_decode(pr, pred))[0]
    # center = (16 + 0.5*8, 24 - 0.25*8) = (20, 22); wh = (32, 16)
    np.testing.assert_allclose(out, [20 - 16, 22 - 8, 20 + 16, 22 + 8],
                               rtol=1e-6)


# ----------------------------------------------------------------- simOTA
def test_sim_ota_matches_torch_oracle():
    """Differential vs the lifted reference assigner over 10 random
    seeds; the padded static version must produce identical assignments
    and matched IoUs."""
    import torch

    from tests.oracles.geometry_oracle import sim_ota_assign_t

    priors_np = yolox_priors((H, W))
    offset = np.concatenate(
        [priors_np[:, :2] + priors_np[:, 2:] * 0.5, priors_np[:, 2:]], -1)
    P = priors_np.shape[0]

    for seed in range(10):
        rng = np.random.RandomState(seed)
        n = rng.randint(1, MAX_GT)
        gts = np.zeros((n, 4), np.float32)
        labels = rng.randint(0, NUM_CLASSES, size=n)
        for j in range(n):
            x1, y1 = rng.uniform(0, W - 30), rng.uniform(0, H - 30)
            w, h = rng.uniform(16, W - x1), rng.uniform(16, H - y1)
            gts[j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
        scores = rng.uniform(0.01, 0.6, size=(P, NUM_CLASSES)) \
            .astype(np.float32)
        # plausible decoded boxes: jittered priors
        cx = offset[:, 0] + rng.uniform(-4, 4, P)
        cy = offset[:, 1] + rng.uniform(-4, 4, P)
        bw = priors_np[:, 2] * rng.uniform(1.0, 6.0, P)
        bh = priors_np[:, 3] * rng.uniform(1.0, 6.0, P)
        dec = np.stack([cx - bw / 2, cy - bh / 2,
                        cx + bw / 2, cy + bh / 2], -1).astype(np.float32)

        want_inds, want_ious = sim_ota_assign_t(
            torch.from_numpy(scores), torch.from_numpy(offset).float(),
            torch.from_numpy(dec), torch.from_numpy(gts),
            torch.from_numpy(labels), NUM_CLASSES)

        padded = np.zeros((MAX_GT, 4), np.float32)
        padded[:n] = gts
        plabels = np.zeros(MAX_GT, np.int64)
        plabels[:n] = labels
        valid = np.zeros(MAX_GT, bool)
        valid[:n] = True
        fg, m_gt, m_iou = sim_ota_assign(
            jnp.asarray(scores), jnp.asarray(offset, dtype=jnp.float32),
            jnp.asarray(dec), jnp.asarray(padded), jnp.asarray(plabels),
            jnp.asarray(valid), NUM_CLASSES)
        got_inds = np.where(np.asarray(fg), np.asarray(m_gt) + 1, 0)
        np.testing.assert_array_equal(got_inds, want_inds.numpy(),
                                      err_msg=f"seed {seed}")
        np.testing.assert_allclose(
            np.where(np.asarray(fg), np.asarray(m_iou), 0.0),
            want_ious.numpy(), atol=1e-5, err_msg=f"seed {seed}")


def test_sim_ota_empty_gt():
    priors_np = yolox_priors((H, W))
    P = priors_np.shape[0]
    fg, _, _ = sim_ota_assign(
        jnp.full((P, NUM_CLASSES), 0.1), jnp.asarray(priors_np),
        jnp.asarray(priors_np), jnp.zeros((MAX_GT, 4)),
        jnp.zeros(MAX_GT, jnp.int32), jnp.zeros(MAX_GT, bool), NUM_CLASSES)
    assert int(fg.sum()) == 0


# ------------------------------------------------------------------ shapes
def test_cspdarknet_shapes():
    m = CSPDarknet(deepen_factor=0.33, widen_factor=0.5)
    vs = jax.jit(m.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    outs = m.apply(vs, jnp.zeros((1, H, W, 3)), False)
    assert [o.shape[1] for o in outs] == [16, 8, 4]
    assert [o.shape[-1] for o in outs] == [128, 256, 512]


def test_pafpn_shapes():
    m = YOLOXPAFPN((128, 256, 512), 128)
    ins = [jnp.zeros((1, 16, 16, 128)), jnp.zeros((1, 8, 8, 256)),
           jnp.zeros((1, 4, 4, 512))]
    vs = jax.jit(m.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), ins, False)
    outs = m.apply(vs, ins, False)
    assert [o.shape[1] for o in outs] == [16, 8, 4]
    assert all(o.shape[-1] == 128 for o in outs)


def test_yolox_head_shapes(yolox):
    model, variables = yolox
    cls_scores, bbox_preds, objs = model.apply(
        variables, jnp.zeros((2, H, W, 3)), False)
    assert len(cls_scores) == 3
    for s, d, o, fs in zip(cls_scores, bbox_preds, objs, (16, 8, 4)):
        assert s.shape == (2, fs, fs, NUM_CLASSES)
        assert d.shape == (2, fs, fs, 4)
        assert o.shape == (2, fs, fs, 1)


# -------------------------------------------------------------------- loss
def test_yolox_loss_positive_and_grads(yolox):
    model, variables = yolox
    batch = _demo_inputs()

    def f(params):
        total, losses, _ = yolox_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return total, losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    for k in ("loss_cls", "loss_obj", "loss_bbox"):
        assert np.isfinite(float(losses[k])) and float(losses[k]) >= 0
    assert float(losses["loss_obj"]) > 0
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_yolox_loss_empty_gt(yolox):
    model, variables = yolox
    batch = _demo_inputs(with_gt=False)
    total, losses, _ = yolox_loss(model, variables, batch,
                                  jax.random.PRNGKey(0))
    assert float(losses["loss_cls"]) == 0.0
    assert float(losses["loss_bbox"]) == 0.0
    assert np.isfinite(float(losses["loss_obj"]))


def test_yolox_loss_l1_flag(yolox):
    """use_l1 (the reference's last-15-epochs hook) adds a finite l1
    term."""
    model, variables = yolox
    batch = _demo_inputs(seed=2)
    _, losses, _ = yolox_loss(model, variables, batch,
                              jax.random.PRNGKey(0), use_l1=True)
    assert "loss_l1" in losses and np.isfinite(float(losses["loss_l1"]))


# --------------------------------------------------------------- inference
def test_yolox_simple_test_shapes(yolox):
    model, variables = yolox
    cfg = SSTestCfg(nms_pre=300, score_thr=0.01, nms_iou=0.65,
                    max_per_img=20)
    out = yolox_simple_test(model, variables, jnp.zeros((2, H, W, 3)), cfg)
    assert out["boxes"].shape == (2, 20, 4)
    assert out["scores"].shape == (2, 20)
    assert out["valid"].shape == (2, 20)


# ---------------------------------------------------------------- learning
def test_yolox_overfits_one_box():
    import optax

    model = YOLOX(num_classes=2)
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
            total, _, aux = yolox_loss(
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

    # re-estimate BN running stats with frozen params: with momentum
    # 0.03 (the reference's) the running averages lag the fast-moving
    # single-image activations by ~30 steps, so eval-mode boxes would
    # reflect stale statistics (verified: train-mode top box IoU ~0.9)
    @jax.jit
    def refresh(bs):
        _, mut = model.apply({"params": params, "batch_stats": bs},
                             batch["image"], True,
                             mutable=["batch_stats"])
        return mut["batch_stats"]

    for _ in range(40):
        bs = refresh(bs)
    out = yolox_simple_test(
        model, {"params": params, "batch_stats": bs}, batch["image"],
        SSTestCfg(nms_pre=300, score_thr=0.01, nms_iou=0.65,
                  max_per_img=10))
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
def test_build_detector_dispatch_yolox():
    from iif_tpu.detection import build_detector

    m, tr, te = build_detector({"type": "YOLOX", "num_classes": 4,
                                "with_mask": False, "deepen": 0.33,
                                "widen": 0.5})
    assert isinstance(m, YOLOX) and m.widen == 0.5
    assert te is SSTestCfg
