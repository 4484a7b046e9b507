"""RepPoints: moment transform math, PointAssigner parity vs a torch
transcription, loss/inference smoke, DCN-in-head gradients, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.reppoints import (
    RepPoints,
    _abs_points,
    point_assign,
    points2bbox_moment,
    reppoints_loss,
    reppoints_simple_test,
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


def test_moment_transform_matches_torch():
    import torch

    rng = np.random.RandomState(0)
    pts = rng.randn(12, 9, 2).astype(np.float32) * 10
    mt = np.asarray([0.3, -0.2], np.float32)
    ours = np.asarray(points2bbox_moment(jnp.asarray(pts),
                                         jnp.asarray(mt)))
    t = torch.from_numpy(pts)
    mean = t.mean(dim=1)
    std = torch.std(t - t.mean(dim=1, keepdim=True), dim=1)
    hw = std[:, 0] * float(np.exp(mt[0]))
    hh = std[:, 1] * float(np.exp(mt[1]))
    ref = torch.stack([mean[:, 0] - hw, mean[:, 1] - hh,
                       mean[:, 0] + hw, mean[:, 1] + hh], -1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def _point_assign_torch(points_xy, points_lvl, gtb, scale=4.0,
                        lvl_min=3, lvl_max=7):
    """``point_assigner.py:30-135`` (pos_num=1) transcribed."""
    import torch

    n = points_xy.shape[0]
    g = gtb.shape[0]
    assigned = torch.zeros(n, dtype=torch.long)
    best = torch.full((n,), float("inf"))
    gcx = (gtb[:, 0] + gtb[:, 2]) / 2
    gcy = (gtb[:, 1] + gtb[:, 3]) / 2
    gw = (gtb[:, 2] - gtb[:, 0]).clamp(min=1e-6)
    gh = (gtb[:, 3] - gtb[:, 1]).clamp(min=1e-6)
    glvl = ((torch.log2(gw / scale) + torch.log2(gh / scale)) / 2) \
        .int().clamp(lvl_min, lvl_max)
    for i in range(g):
        mask = points_lvl == glvl[i]
        d = torch.sqrt(((points_xy[:, 0] - gcx[i]) / gw[i]) ** 2
                       + ((points_xy[:, 1] - gcy[i]) / gh[i]) ** 2)
        d[~mask] = float("inf")
        md, mi = d.min(0)
        if md < best[mi]:
            assigned[mi] = i + 1
            best[mi] = md
    return assigned


def test_point_assign_matches_torch():
    import torch

    from iif_tpu.detection.reppoints import _grid_centers
    from iif_tpu.detection.single_stage import SS_STRIDES, ss_fpn_shapes

    shapes = ss_fpn_shapes((H, W))
    centers, lvls, _ = _grid_centers(shapes, SS_STRIDES)
    for seed in range(10):
        rng = np.random.RandomState(seed)
        g = rng.randint(1, 6)
        gtb = np.zeros((g, 4), np.float32)
        gtb[:, :2] = rng.uniform(0, W - 60, (g, 2))
        gtb[:, 2:] = gtb[:, :2] + rng.uniform(12, 60, (g, 2))
        gtb_p = np.zeros((MAX_GT, 4), np.float32)
        gtb_p[:g] = gtb
        gtv = np.zeros(MAX_GT, bool)
        gtv[:g] = True
        ours = np.asarray(point_assign(
            jnp.asarray(centers), jnp.asarray(lvls), jnp.asarray(gtb_p),
            jnp.asarray(gtv)))
        ref = _point_assign_torch(
            torch.from_numpy(centers), torch.from_numpy(lvls),
            torch.from_numpy(gtb)).numpy()
        np.testing.assert_array_equal(ours, ref)


def test_abs_points_layout():
    """Head offsets are y-first pairs; absolute points are xy."""
    centers = jnp.asarray([[10.0, 20.0]])
    off = jnp.asarray([[1.0, 2.0] + [0.0] * 16])   # (dy, dx) = (1, 2)
    strides = jnp.asarray([8.0])
    pts = np.asarray(_abs_points(centers, off, strides))
    np.testing.assert_allclose(pts[0, 0], [10 + 2 * 8, 20 + 1 * 8])


@pytest.fixture(scope="module")
def reppoints():
    model = RepPoints(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_reppoints_loss_and_grads(reppoints):
    model, variables = reppoints
    batch = _demo_inputs()
    total, losses, _ = reppoints_loss(model, variables, batch,
                                      jax.random.PRNGKey(0))
    assert set(losses) == {"loss_cls", "loss_pts_init", "loss_pts_refine"}
    for k, v in losses.items():
        assert np.isfinite(float(v)) and float(v) >= 0, (k, float(v))

    def f(params):
        t, _, _ = reppoints_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return t

    grads = jax.grad(f)(variables["params"])
    for leaf in ("cls_dcn_kernel", "refine_dcn_kernel", "moment_transfer"):
        g = grads["bbox_head"][leaf]
        assert float(jnp.abs(g).max()) > 0, leaf


def test_reppoints_simple_test(reppoints):
    model, variables = reppoints
    batch = _demo_inputs()
    out = reppoints_simple_test(model, variables, batch["image"],
                                SSTestCfg(nms_pre=200, max_per_img=20))
    assert out["boxes"].shape == (2, 20, 4)
    b = np.asarray(out["boxes"])
    assert (b[..., 2] >= b[..., 0] - 1e-3).all()


def test_reppoints_build_and_trainer_step():
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model, _, _ = build_detector(
        {"type": "RepPointsDetector", "depth": 18,
         "num_classes": NUM_CLASSES, "frozen_stages": -1})
    assert isinstance(model, RepPoints)
    trainer = DetectionTrainer(model, None, optax.sgd(1e-3), make_mesh(),
                               train_cfg=SSTrainCfg())
    state = trainer.init_state((H, W, 3))
    state2, metrics = trainer._train_step(state, _demo_inputs())
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
