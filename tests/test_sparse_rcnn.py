"""Sparse R-CNN: DynamicConv math vs a torch transcription, focal
Hungarian matching sanity, per-stage losses, NMS-free inference,
dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg
from iif_tpu.detection.sparse_rcnn import (
    DynamicConv,
    SparseRCNN,
    _focal_hungarian,
    sparse_rcnn_loss,
    sparse_rcnn_simple_test,
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


def test_dynamic_conv_matches_torch():
    """The two-bmm contraction must equal the reference DynamicConv
    (transformer.py:1111-1156) given identical parameters."""
    import torch

    rng = np.random.RandomState(0)
    n, c, f, s = 3, 16, 8, 7
    pf = rng.randn(n, c).astype(np.float32)
    roi = rng.randn(n, s, s, c).astype(np.float32)
    dc = DynamicConv(in_channels=c, feat_channels=f, out_channels=c)
    variables = dc.init(jax.random.PRNGKey(0), jnp.asarray(pf),
                        jnp.asarray(roi))
    ours = np.asarray(dc.apply(variables, jnp.asarray(pf),
                               jnp.asarray(roi)))

    p = variables["params"]
    w_dyn = np.asarray(p["dynamic_layer"]["kernel"])
    b_dyn = np.asarray(p["dynamic_layer"]["bias"])
    params = torch.from_numpy(pf) @ torch.from_numpy(w_dyn) \
        + torch.from_numpy(b_dyn)
    p_in = params[:, :c * f].view(n, c, f)
    p_out = params[:, -f * c:].view(n, f, c)
    x = torch.from_numpy(roi).reshape(n, s * s, c)

    def ln(t, scale, bias):
        mu = t.mean(-1, keepdim=True)
        var = t.var(-1, unbiased=False, keepdim=True)
        return (t - mu) / torch.sqrt(var + 1e-6) \
            * torch.from_numpy(np.asarray(scale)) \
            + torch.from_numpy(np.asarray(bias))

    feats = torch.bmm(x, p_in)
    feats = torch.relu(ln(feats, p["norm_in"]["scale"],
                          p["norm_in"]["bias"]))
    feats = torch.bmm(feats, p_out)
    feats = torch.relu(ln(feats, p["norm_out"]["scale"],
                          p["norm_out"]["bias"]))
    feats = feats.flatten(1)
    feats = feats @ torch.from_numpy(np.asarray(
        p["fc_layer"]["kernel"])) + torch.from_numpy(
        np.asarray(p["fc_layer"]["bias"]))
    ref = torch.relu(ln(feats, p["fc_norm"]["scale"],
                        p["fc_norm"]["bias"])).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_focal_hungarian_one_to_one():
    rng = np.random.RandomState(1)
    q, g = 20, 4
    logits = rng.randn(q, NUM_CLASSES).astype(np.float32)
    boxes = np.zeros((q, 4), np.float32)
    boxes[:, :2] = rng.uniform(0, 90, (q, 2))
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(8, 30, (q, 2))
    gtb = np.zeros((MAX_GT, 4), np.float32)
    gtb[:g, :2] = rng.uniform(0, 90, (g, 2))
    gtb[:g, 2:] = gtb[:g, :2] + rng.uniform(8, 30, (g, 2))
    gtl = np.zeros(MAX_GT, np.int64)
    gtv = np.zeros(MAX_GT, bool)
    gtv[:g] = True
    assigned = np.asarray(_focal_hungarian(
        jnp.asarray(logits), jnp.asarray(boxes), jnp.asarray(gtb),
        jnp.asarray(gtl), jnp.asarray(gtv),
        jnp.asarray([128.0, 128.0])))
    pos = assigned[assigned > 0]
    assert len(pos) == g                       # every valid gt matched once
    assert len(np.unique(pos)) == g            # one-to-one


@pytest.fixture(scope="module")
def sparse():
    model = SparseRCNN(num_classes=NUM_CLASSES, depth=18,
                       frozen_stages=-1, num_proposals=16,
                       num_dii_stages=2)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_sparse_rcnn_loss(sparse):
    model, variables = sparse
    batch = _demo_inputs()
    total, losses, _ = sparse_rcnn_loss(model, variables, batch,
                                        jax.random.PRNGKey(0))
    for s in range(2):
        for part in ("loss_cls", "loss_bbox", "loss_iou"):
            k = f"stage{s}_{part}"
            assert k in losses and np.isfinite(float(losses[k])), k

    def f(params):
        t, _, _ = sparse_rcnn_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return t

    grads = jax.grad(f)(variables["params"])
    assert float(jnp.abs(grads["init_proposal_bboxes"]).max()) > 0
    assert float(jnp.abs(grads["init_proposal_features"]).max()) > 0


def test_sparse_rcnn_simple_test(sparse):
    model, variables = sparse
    batch = _demo_inputs()
    out = sparse_rcnn_simple_test(model, variables, batch["image"],
                                  SSTestCfg(max_per_img=16, score_thr=0.0))
    assert out["boxes"].shape == (2, 16, 4)
    s = np.asarray(out["scores"])
    assert (np.diff(s, axis=1) <= 1e-6).all()   # ranked descending


def test_sparse_rcnn_build_and_trainer_step():
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model, _, _ = build_detector(
        {"type": "SparseRCNN", "depth": 18, "num_classes": NUM_CLASSES,
         "frozen_stages": -1, "num_proposals": 8, "num_dii_stages": 2})
    assert isinstance(model, SparseRCNN)
    trainer = DetectionTrainer(model, None, optax.adamw(1e-4),
                               make_mesh(), train_cfg=SSTrainCfg())
    state = trainer.init_state((H, W, 3))
    state2, metrics = trainer._train_step(state, _demo_inputs())
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
