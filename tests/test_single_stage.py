"""Single-stage detectors (RetinaNet / FCOS): anchor parity vs the torch
oracle, FPN extra-conv topologies, loss/forward/inference smoke tests in
the reference's ``test_forward.py`` style, FCOS target golden cases, a
tiny overfit learning check, and trainer integration."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.necks import FPN
from iif_tpu.detection.single_stage import (
    FCOS,
    FCOS_REGRESS_RANGES,
    RetinaNet,
    SSTestCfg,
    SSTrainCfg,
    distance2bbox,
    fcos_loss,
    fcos_points,
    fcos_simple_test,
    fcos_targets,
    make_retina_anchor_generator,
    retinanet_loss,
    retinanet_simple_test,
    ss_fpn_shapes,
)

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
def retina():
    model = RetinaNet(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


@pytest.fixture(scope="module")
def fcos():
    model = FCOS(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


# ------------------------------------------------------------------ anchors
def test_retina_anchors_match_torch_oracle():
    """Octave anchors (4*2^(i/3) scales) vs the lifted reference
    AnchorGenerator — exact to f32."""
    from tests.oracles.geometry_oracle import AnchorOracle

    scales = [4.0 * 2.0 ** (i / 3.0) for i in range(3)]
    strides = [8, 16, 32, 64, 128]
    ours = make_retina_anchor_generator()
    oracle = AnchorOracle(strides, ratios=(0.5, 1.0, 2.0), scales=scales)
    shapes = ss_fpn_shapes((H, W))
    got = ours.grid_anchors(shapes)
    want = oracle.grid_anchors(shapes)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w.numpy(), rtol=0, atol=1e-4)
    gv = ours.valid_flags(shapes, (100, 120))
    wv = oracle.valid_flags(shapes, (100, 120))
    for g, w in zip(gv, wv):
        np.testing.assert_array_equal(g, w.numpy())


# --------------------------------------------------------------------- FPN
def test_fpn_extra_convs_on_input():
    """RetinaNet topology: C3-C5 laterals, P6/P7 stride-2 convs on C5."""
    fpn = FPN(out_channels=32, num_outs=5, start_level=1,
              add_extra_convs="on_input")
    ins = [jnp.zeros((1, 64 // s, 64 // s, c))
           for s, c in zip((1, 2, 4, 8), (64, 128, 256, 512))]
    vs = fpn.init(jax.random.PRNGKey(0), ins)
    outs = fpn.apply(vs, ins)
    assert len(outs) == 5
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]
    assert "extra_conv_0" in vs["params"] and "extra_conv_1" in vs["params"]
    # start_level=1: only 3 laterals exist
    assert "lateral_0" in vs["params"] and "lateral_3" not in vs["params"]


def test_fpn_extra_convs_on_output():
    fpn = FPN(out_channels=32, num_outs=5, start_level=1,
              add_extra_convs="on_output", relu_before_extra_convs=True)
    ins = [jnp.zeros((1, 64 // s, 64 // s, c))
           for s, c in zip((1, 2, 4, 8), (64, 128, 256, 512))]
    vs = fpn.init(jax.random.PRNGKey(0), ins)
    outs = fpn.apply(vs, ins)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]


# ---------------------------------------------------------------- RetinaNet
def test_retinanet_forward_shapes(retina):
    model, variables = retina
    cls_scores, bbox_preds = model.apply(
        variables, jnp.zeros((2, H, W, 3)), False)
    assert len(cls_scores) == 5
    for s, d, (fh, fw) in zip(cls_scores, bbox_preds, ss_fpn_shapes((H, W))):
        assert s.shape == (2, fh, fw, 9 * NUM_CLASSES)
        assert d.shape == (2, fh, fw, 9 * 4)


def test_retinanet_cls_bias_prior(retina):
    """Focal cls bias init: initial fg prob ~= 0.01 (RetinaNet paper)."""
    _, variables = retina
    bias = np.asarray(
        variables["params"]["bbox_head"]["retina_cls"]["bias"])
    np.testing.assert_allclose(1 / (1 + np.exp(-bias)), 0.01, atol=1e-6)


def test_retinanet_loss_positive_and_grads(retina):
    model, variables = retina
    batch = _demo_inputs()

    def f(params):
        total, losses, _ = retinanet_loss(
            model, {"params": params,
                    "batch_stats": variables.get("batch_stats", {})},
            batch, jax.random.PRNGKey(0))
        return total, losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    assert float(total) > 0
    assert float(losses["loss_cls"]) > 0
    assert float(losses["loss_bbox"]) > 0
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_retinanet_loss_empty_gt(retina):
    """Empty-GT images: zero bbox loss, finite cls loss (everything is
    background) — the reference's test_forward.py empty-gt case."""
    model, variables = retina
    batch = _demo_inputs(with_gt=False)
    total, losses, _ = retinanet_loss(model, variables, batch,
                                      jax.random.PRNGKey(0))
    assert float(losses["loss_bbox"]) == 0.0
    assert np.isfinite(float(losses["loss_cls"]))


def test_retinanet_simple_test_shapes(retina):
    model, variables = retina
    cfg = SSTestCfg(nms_pre=200, max_per_img=20)
    out = retinanet_simple_test(model, variables,
                                jnp.zeros((2, H, W, 3)), cfg)
    assert out["boxes"].shape == (2, 20, 4)
    assert out["scores"].shape == (2, 20)
    assert out["labels"].shape == (2, 20)
    assert out["valid"].shape == (2, 20)


def test_retinanet_overfits_one_box():
    """Learning check: ~80 adam steps on a single-box image drive the
    loss down >50% and the top detection onto the gt box."""
    import optax

    model = RetinaNet(num_classes=2, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    rng = np.random.RandomState(3)
    img = rng.randn(1, H, W, 3).astype(np.float32)
    img[0, 32:96, 24:104] += 2.0   # visible object
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
            total, _, _ = retinanet_loss(
                model, {"params": p, "batch_stats": bs0}, batch,
                jax.random.PRNGKey(0))
            return total

        loss, g = jax.value_and_grad(f)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for i in range(80):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first
    out = retinanet_simple_test(
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


# --------------------------------------------------------------------- FCOS
def test_fcos_points_levels():
    pts, strides, ranges = fcos_points((H, W))
    shapes = ss_fpn_shapes((H, W))
    assert pts.shape[0] == sum(h * w for h, w in shapes)
    # first level-0 point sits at stride//2
    np.testing.assert_allclose(pts[0], [4.0, 4.0])
    assert strides[0] == 8 and strides[-1] == 128
    np.testing.assert_allclose(ranges[0], FCOS_REGRESS_RANGES[0])
    np.testing.assert_allclose(ranges[-1], FCOS_REGRESS_RANGES[-1])


def test_fcos_targets_golden():
    """Hand-derived single-gt case: a 48x48 box is assigned to level-0
    points strictly inside it (max ltrb <= 64); its exact center has
    centerness 1; points outside are background."""
    pts, strides, ranges = fcos_points((H, W))
    gt = jnp.asarray([[16.0, 16.0, 64.0, 64.0]])
    labels, ltrb, ctr = fcos_targets(
        jnp.asarray(pts), jnp.asarray(ranges), jnp.asarray(strides),
        gt, jnp.asarray([2]), jnp.asarray([True]), NUM_CLASSES)
    labels = np.asarray(labels)
    ctr = np.asarray(ctr)
    inside = ((pts[:, 0] > 16) & (pts[:, 0] < 64)
              & (pts[:, 1] > 16) & (pts[:, 1] < 64))
    max_reg = np.maximum.reduce([
        pts[:, 0] - 16, pts[:, 1] - 16, 64 - pts[:, 0], 64 - pts[:, 1]])
    expect_pos = inside & (max_reg >= ranges[:, 0]) & (max_reg <= ranges[:, 1])
    np.testing.assert_array_equal(labels == 2, expect_pos)
    np.testing.assert_array_equal(labels[~expect_pos], NUM_CLASSES)
    # the centerness formula at an interior grid point (36, 36)
    center_idx = np.where((pts[:, 0] == 36) & (pts[:, 1] == 36))[0][0]
    l, t, r, b = np.asarray(ltrb)[center_idx]
    want = np.sqrt((min(l, r) / max(l, r)) * (min(t, b) / max(t, b)))
    np.testing.assert_allclose(ctr[center_idx], want, rtol=1e-6)
    # positive points decode back to the gt box exactly
    dec = np.asarray(distance2bbox(jnp.asarray(pts), ltrb))
    np.testing.assert_allclose(dec[expect_pos],
                               np.tile(np.asarray(gt[0]),
                                       (expect_pos.sum(), 1)), atol=1e-4)


def test_fcos_targets_min_area_wins():
    """Two nested gts: points inside both go to the smaller one."""
    pts, strides, ranges = fcos_points((H, W))
    gts = jnp.asarray([[0.0, 0.0, 64.0, 64.0],     # big
                       [24.0, 24.0, 48.0, 48.0]])  # small, nested
    labels, _, _ = fcos_targets(
        jnp.asarray(pts), jnp.asarray(ranges), jnp.asarray(strides),
        gts, jnp.asarray([1, 3]), jnp.asarray([True, True]), NUM_CLASSES)
    labels = np.asarray(labels)
    in_small = ((pts[:, 0] > 24) & (pts[:, 0] < 48)
                & (pts[:, 1] > 24) & (pts[:, 1] < 48))
    max_reg_small = np.maximum.reduce([
        pts[:, 0] - 24, pts[:, 1] - 24, 48 - pts[:, 0], 48 - pts[:, 1]])
    small_ok = in_small & (max_reg_small >= ranges[:, 0]) \
        & (max_reg_small <= ranges[:, 1])
    assert (labels[small_ok] == 3).all()


def test_fcos_loss_positive_and_grads(fcos):
    model, variables = fcos
    batch = _demo_inputs(seed=1)

    def f(params):
        total, losses, _ = fcos_loss(
            model, {"params": params,
                    "batch_stats": variables.get("batch_stats", {})},
            batch, jax.random.PRNGKey(0))
        return total, losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    for k in ("loss_cls", "loss_bbox", "loss_centerness"):
        assert np.isfinite(float(losses[k])) and float(losses[k]) >= 0
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # per-level reg scales exist and received gradients
    assert "scale_0" in grads["bbox_head"]


def test_fcos_loss_empty_gt(fcos):
    model, variables = fcos
    batch = _demo_inputs(with_gt=False)
    total, losses, _ = fcos_loss(model, variables, batch,
                                 jax.random.PRNGKey(0))
    assert float(losses["loss_bbox"]) == 0.0
    assert float(losses["loss_centerness"]) == 0.0
    assert np.isfinite(float(losses["loss_cls"]))


def test_fcos_simple_test_shapes(fcos):
    model, variables = fcos
    cfg = SSTestCfg(nms_pre=200, max_per_img=15)
    out = fcos_simple_test(model, variables, jnp.zeros((2, H, W, 3)), cfg)
    assert out["boxes"].shape == (2, 15, 4)
    assert out["valid"].shape == (2, 15)


# ------------------------------------------------------------------ trainer
def test_trainer_single_stage_step(single_mesh):
    """DetectionTrainer dispatches single-stage losses; one jitted step
    updates params and returns finite metrics."""
    import optax

    from iif_tpu.engine.detection import DetectionTrainer

    model = RetinaNet(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    trainer = DetectionTrainer(model, loss_cls=None, tx=optax.sgd(0.01),
                               mesh=single_mesh, train_cfg=SSTrainCfg())
    state = trainer.init_state((H, W, 3))
    # the step donates its input state: snapshot params on the host first
    old_params = jax.tree_util.tree_map(np.asarray, state.params)
    batch = _demo_inputs()
    new_state, metrics = trainer._train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = sum(
        float(np.abs(np.asarray(n) - o).sum())
        for n, o in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(old_params)))
    assert moved > 0


def test_build_detector_dispatch():
    from iif_tpu.detection import build_detector
    from iif_tpu.detection.detector import DetTestCfg, DetTrainCfg

    m, tr, te = build_detector({"type": "RetinaNet", "num_classes": 4,
                                "depth": 18, "with_mask": False})
    assert isinstance(m, RetinaNet) and tr is SSTrainCfg and te is SSTestCfg
    m, tr, te = build_detector({"type": "FCOS", "num_classes": 4,
                                "depth": 18, "with_mask": False})
    assert isinstance(m, FCOS)
    m, tr, te = build_detector({"num_classes": 4, "depth": 18})
    assert tr is DetTrainCfg and te is DetTestCfg
