"""Deformable DETR: sine positional embedding parity, MSDeformAttn
offset-bias init geometry, loss with deep supervision, NMS-free
inference, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.deformable_detr import (
    DeformableDETR,
    MSDeformAttn,
    deformable_detr_loss,
    deformable_detr_simple_test,
    inverse_sigmoid,
    sine_pos_embed,
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


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.1, 0.5, 0.93])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x),
        rtol=1e-5)


def test_sine_pos_embed_properties():
    p = sine_pos_embed(jnp.asarray([[0.25, 0.75], [0.25, 0.75]]))
    assert p.shape == (2, 256)
    np.testing.assert_allclose(np.asarray(p[0]), np.asarray(p[1]))
    # distinct positions -> distinct embeddings
    q = sine_pos_embed(jnp.asarray([[0.75, 0.25]]))
    assert np.abs(np.asarray(p[0]) - np.asarray(q[0])).max() > 0.1


def test_msda_zero_init_averages_reference_neighborhood():
    """With zero attention logits the weights are uniform; output is the
    value-projected average of the star taps."""
    attn = MSDeformAttn(num_levels=2)
    shapes = [(8, 8), (4, 4)]
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(1, 8 * 8 + 4 * 4, 256).astype(np.float32))
    query = jnp.asarray(rng.randn(1, 3, 256).astype(np.float32))
    ref = jnp.tile(jnp.asarray([[[0.5, 0.5]]]), (1, 3, 1))[:, :, None, :]
    ref = jnp.broadcast_to(ref, (1, 3, 2, 2))
    variables = attn.init(jax.random.PRNGKey(0), query, value, shapes, ref)
    out = attn.apply(variables, query, value, shapes, ref)
    assert out.shape == (1, 3, 256)
    assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def ddetr():
    model = DeformableDETR(num_classes=NUM_CLASSES, depth=18,
                           frozen_stages=-1, num_query=20,
                           num_enc_layers=2, num_dec_layers=2)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_ddetr_forward_shapes(ddetr):
    model, variables = ddetr
    batch = _demo_inputs()
    all_cls, all_boxes = model.apply(
        variables, batch["image"], False,
        method=DeformableDETR.forward_all)
    assert all_cls.shape == (2, 2, 20, NUM_CLASSES)
    assert all_boxes.shape == (2, 2, 20, 4)
    b = np.asarray(all_boxes)
    assert (b >= 0).all() and (b <= 1).all()   # normalized cxcywh


def test_ddetr_loss_deep_supervision(ddetr):
    model, variables = ddetr
    batch = _demo_inputs()
    total, losses, _ = deformable_detr_loss(model, variables, batch,
                                            jax.random.PRNGKey(0))
    assert "loss_cls" in losses and "d0.loss_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def f(params):
        t, _, _ = deformable_detr_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0))
        return t

    grads = jax.grad(f)(variables["params"])
    # NOTE level_embed legitimately has ZERO grad at init: it reaches
    # the loss only through the zero-initialized sampling_offsets /
    # attention_weights kernels (dL/dquery = W^T d = 0 when W = 0) —
    # the kernels themselves train first, as in the reference init.
    assert float(jnp.abs(grads["query_embed"]).max()) > 0
    for leaf in ("sampling_offsets", "attention_weights", "value_proj"):
        g = grads["dec_cross_0"][leaf]["kernel"]
        assert float(jnp.abs(g).max()) > 0, leaf


def test_ddetr_simple_test_and_build(ddetr):
    model, variables = ddetr
    batch = _demo_inputs()
    out = deformable_detr_simple_test(
        model, variables, batch["image"],
        SSTestCfg(max_per_img=10, score_thr=0.0))
    assert out["boxes"].shape == (2, 10, 4)

    from iif_tpu.detection import build_detector

    m, _, _ = build_detector(
        {"type": "DeformableDETR", "depth": 18,
         "num_classes": NUM_CLASSES, "num_query": 10,
         "num_enc_layers": 1, "num_dec_layers": 1})
    assert isinstance(m, DeformableDETR)
