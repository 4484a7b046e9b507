"""DETR: sine positional-encoding goldens, Hungarian matching parity vs
scipy on the reference cost, head/transformer shapes, loss (aux deep
supervision) smoke, inference smoke, overfit learning check, trainer
integration, and build_detector dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.detr import (
    DETR,
    bbox_cxcywh_to_xyxy,
    bbox_xyxy_to_cxcywh,
    detr_loss,
    detr_simple_test,
    hungarian_match,
    sine_positional_encoding,
)

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8
NUM_QUERY = 20


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
            "gt_valid": jnp.asarray(gt_valid),
            "img_shape": jnp.tile(jnp.asarray([[H, W]], jnp.int32),
                                  (b, 1))}


@pytest.fixture(scope="module")
def detr():
    model = DETR(num_classes=NUM_CLASSES, depth=18, num_query=NUM_QUERY,
                 frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.asarray([[H, W]], jnp.int32), False)
    return model, variables


# -------------------------------------------------------------------- utils
def test_box_conversions_roundtrip():
    rng = np.random.RandomState(0)
    xyxy = rng.rand(16, 4).astype(np.float32)
    xyxy[:, 2:] += xyxy[:, :2]
    back = np.asarray(bbox_cxcywh_to_xyxy(
        bbox_xyxy_to_cxcywh(jnp.asarray(xyxy))))
    np.testing.assert_allclose(back, xyxy, atol=1e-6)


def test_sine_positional_encoding_golden():
    """Against the reference formula (normalize=True, scale=2pi,
    temperature 1e4): no padding -> last row/col hit exactly 2pi before
    the sin/cos; spot-check the (0, 0) cell's first feature pair."""
    mask = jnp.zeros((1, 4, 4), bool)
    pos = np.asarray(sine_positional_encoding(mask, num_feats=4))
    assert pos.shape == (1, 4, 4, 8)
    # y embed at row r = (r+1)/4 * 2pi; x embed at col c = (c+1)/4 * 2pi
    two_pi = 2 * np.pi
    e = 1e-6
    y0 = 1.0 / (4 + e * 4) * two_pi                # row 0: 1/4 * 2pi
    # dim_t for num_feats=4: [1, 1, 1e4^(1/2), 1e4^(1/2)]; features
    # interleave [sin(y/d0), cos(y/d1), sin(y/d2), cos(y/d3)]
    want00 = [np.sin(y0), np.cos(y0), np.sin(y0 / 100.0),
              np.cos(y0 / 100.0)]
    np.testing.assert_allclose(pos[0, 0, 0, :4], want00, atol=1e-5)
    # padding column kills the x growth: masked cells contribute nothing
    mask2 = jnp.zeros((1, 4, 4), bool).at[:, :, 2:].set(True)
    pos2 = np.asarray(sine_positional_encoding(mask2, num_feats=4))
    assert not np.allclose(pos2, pos)


# ---------------------------------------------------------------- matching
def test_hungarian_match_parity_vs_scipy():
    """The in-graph assignment must equal scipy's
    linear_sum_assignment on the reference cost (softmax cls + L1 xywh
    + GIoU), across random seeds and padded gt counts."""
    import torch
    from scipy.optimize import linear_sum_assignment

    for seed in range(8):
        rng = np.random.RandomState(seed)
        n = rng.randint(1, MAX_GT)
        q = NUM_QUERY
        cls_logits = rng.randn(q, NUM_CLASSES + 1).astype(np.float32)
        bbox_pred = rng.uniform(0.1, 0.9, (q, 4)).astype(np.float32)
        gts = np.zeros((MAX_GT, 4), np.float32)
        labels = np.zeros(MAX_GT, np.int64)
        valid = np.zeros(MAX_GT, bool)
        for j in range(n):
            x1, y1 = rng.uniform(0, W - 20), rng.uniform(0, H - 20)
            w, h = rng.uniform(10, W - x1), rng.uniform(10, H - y1)
            gts[j] = [x1, y1, x1 + w, y1 + h]
            labels[j] = rng.randint(0, NUM_CLASSES)
            valid[j] = True

        # reference cost (hungarian_assigner.py:117-134)
        t_logits = torch.from_numpy(cls_logits)
        t_pred = torch.from_numpy(bbox_pred)
        t_gt = torch.from_numpy(gts[:n])
        factor = torch.tensor([W, H, W, H], dtype=torch.float32)
        cls_cost = -t_logits.softmax(-1)[:, torch.from_numpy(labels[:n])]
        gt_norm = t_gt / factor
        gt_cxcywh = torch.stack(
            [(gt_norm[:, 0] + gt_norm[:, 2]) / 2,
             (gt_norm[:, 1] + gt_norm[:, 3]) / 2,
             gt_norm[:, 2] - gt_norm[:, 0],
             gt_norm[:, 3] - gt_norm[:, 1]], -1)
        reg_cost = torch.cdist(t_pred, gt_cxcywh, p=1) * 5.0
        px = t_pred * factor
        pred_xyxy = torch.stack(
            [px[:, 0] - px[:, 2] / 2, px[:, 1] - px[:, 3] / 2,
             px[:, 0] + px[:, 2] / 2, px[:, 1] + px[:, 3] / 2], -1)

        def giou(a, b):
            area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
            area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            lt = torch.max(a[:, None, :2], b[None, :, :2])
            rb = torch.min(a[:, None, 2:], b[None, :, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[..., 0] * wh[..., 1]
            union = (area_a[:, None] + area_b[None, :] - inter).clamp(
                min=1e-6)
            ious = inter / union
            lt_e = torch.min(a[:, None, :2], b[None, :, :2])
            rb_e = torch.max(a[:, None, 2:], b[None, :, 2:])
            wh_e = (rb_e - lt_e).clamp(min=0)
            enc = (wh_e[..., 0] * wh_e[..., 1]).clamp(min=1e-6)
            return ious - (enc - union) / enc

        iou_cost = -giou(pred_xyxy, t_gt) * 2.0
        cost = (cls_cost + reg_cost + iou_cost).numpy()
        rows, cols = linear_sum_assignment(cost)
        want = np.zeros(q, np.int64)
        want[rows] = cols + 1

        got, npos = hungarian_match(
            jnp.asarray(cls_logits), jnp.asarray(bbox_pred),
            jnp.asarray(gts), jnp.asarray(labels), jnp.asarray(valid),
            jnp.asarray([H, W], jnp.int32))
        assert int(npos) == n
        np.testing.assert_array_equal(np.asarray(got), want,
                                      err_msg=f"seed {seed}")


def test_hungarian_match_empty_gt():
    got, npos = hungarian_match(
        jnp.zeros((NUM_QUERY, NUM_CLASSES + 1)),
        jnp.full((NUM_QUERY, 4), 0.5), jnp.zeros((MAX_GT, 4)),
        jnp.zeros(MAX_GT, jnp.int32), jnp.zeros(MAX_GT, bool),
        jnp.asarray([H, W], jnp.int32))
    assert int(npos) == 0 and int(jnp.abs(got).sum()) == 0


# ------------------------------------------------------------------ shapes
def test_detr_forward_shapes(detr):
    model, variables = detr
    all_cls, all_bbox = model.apply(
        variables, jnp.zeros((2, H, W, 3)),
        jnp.asarray([[H, W], [100, 120]], jnp.int32), False)
    assert all_cls.shape == (6, 2, NUM_QUERY, NUM_CLASSES + 1)
    assert all_bbox.shape == (6, 2, NUM_QUERY, 4)
    b = np.asarray(all_bbox)
    assert (b >= 0).all() and (b <= 1).all()       # sigmoid normalized


# -------------------------------------------------------------------- loss
def test_detr_loss_aux_and_grads(detr):
    model, variables = detr
    batch = _demo_inputs()

    def f(params):
        total, losses, _ = detr_loss(
            model, {"params": params,
                    "batch_stats": variables.get("batch_stats", {})},
            batch, jax.random.PRNGKey(0))
        return total, losses

    (total, losses), grads = jax.value_and_grad(f, has_aux=True)(
        variables["params"])
    # final + 5 aux layers, 3 terms each
    assert len(losses) == 18
    for k in ("loss_cls", "loss_bbox", "loss_iou", "d0.loss_cls"):
        assert np.isfinite(float(losses[k]))
    assert float(losses["loss_cls"]) > 0
    gnorm = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # every decoder layer received gradient (deep supervision)
    assert "decoder_0" in grads["bbox_head"]
    assert "query_embedding" in grads["bbox_head"]


def test_detr_loss_empty_gt(detr):
    model, variables = detr
    batch = _demo_inputs(with_gt=False)
    total, losses, _ = detr_loss(model, variables, batch,
                                 jax.random.PRNGKey(0))
    assert float(losses["loss_bbox"]) == 0.0
    assert float(losses["loss_iou"]) == 0.0
    assert np.isfinite(float(losses["loss_cls"]))


# --------------------------------------------------------------- inference
def test_detr_simple_test_shapes(detr):
    model, variables = detr
    out = detr_simple_test(model, variables, jnp.zeros((2, H, W, 3)),
                           max_per_img=NUM_QUERY)
    assert out["boxes"].shape == (2, NUM_QUERY, 4)
    assert out["scores"].shape == (2, NUM_QUERY)
    b = np.asarray(out["boxes"])
    assert (b[..., 0] >= 0).all() and (b[..., 2] <= W).all()


# ---------------------------------------------------------------- learning
def test_detr_overfits_one_box():
    import optax

    model = DETR(num_classes=2, depth=18, num_query=NUM_QUERY,
                 frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)),
        jnp.asarray([[H, W]], jnp.int32), False)
    rng = np.random.RandomState(3)
    img = rng.randn(1, H, W, 3).astype(np.float32)
    img[0, 32:96, 24:104] += 2.0
    batch = {
        "image": jnp.asarray(img),
        "gt_boxes": jnp.asarray([[[24.0, 32.0, 104.0, 96.0]]
                                 + [[0.0] * 4] * (MAX_GT - 1)]),
        "gt_labels": jnp.zeros((1, MAX_GT), jnp.int32),
        "gt_valid": jnp.asarray([[True] + [False] * (MAX_GT - 1)]),
        "img_shape": jnp.asarray([[H, W]], jnp.int32),
    }
    tx = optax.adamw(1e-4)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        def f(p):
            total, _, _ = detr_loss(model, {"params": p,
                                            "batch_stats": bs},
                                    batch, key)
            return total

        loss, g = jax.value_and_grad(f)(params)
        upd, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for i in range(120):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(i))
        if first is None:
            first = float(loss)
    assert float(loss) < 0.6 * first
    out = detr_simple_test(model, {"params": params, "batch_stats": bs},
                           batch["image"], max_per_img=5)
    top = np.asarray(out["boxes"][0, 0])
    gt = np.array([24.0, 32.0, 104.0, 96.0])
    ix1, iy1 = np.maximum(top[:2], gt[:2])
    ix2, iy2 = np.minimum(top[2:], gt[2:])
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    union = ((top[2] - top[0]) * (top[3] - top[1])
             + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
    assert inter / union > 0.3


# ------------------------------------------------------------------ trainer
def test_trainer_detr_step(single_mesh):
    import optax

    from iif_tpu.detection.single_stage import SSTrainCfg
    from iif_tpu.engine.detection import DetectionTrainer

    model = DETR(num_classes=NUM_CLASSES, depth=18, num_query=NUM_QUERY,
                 frozen_stages=-1)
    trainer = DetectionTrainer(model, loss_cls=None, tx=optax.sgd(0.01),
                               mesh=single_mesh, train_cfg=SSTrainCfg())
    state = trainer.init_state((H, W, 3))
    old_params = jax.tree_util.tree_map(np.asarray, state.params)
    batch = _demo_inputs()
    new_state, metrics = trainer._train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    moved = sum(
        float(np.abs(np.asarray(n) - o).sum())
        for n, o in zip(jax.tree_util.tree_leaves(new_state.params),
                        jax.tree_util.tree_leaves(old_params)))
    assert moved > 0


def test_build_detector_dispatch_detr():
    from iif_tpu.detection import build_detector

    m, tr, te = build_detector({"type": "DETR", "num_classes": 4,
                                "depth": 18, "num_query": 50,
                                "with_mask": False})
    assert isinstance(m, DETR) and m.num_query == 50
