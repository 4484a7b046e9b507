"""Backbone plugins: GCNet ContextBlock + GeneralizedAttention
(configs/gcnet, configs/empirical_attention)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iif_tpu.models.layers import ContextBlock, GeneralizedAttention


def test_context_block_identity_at_init():
    """Zero-init final projection -> block starts as identity."""
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16),
                    jnp.float32)
    blk = ContextBlock(ratio=0.25)
    v = blk.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(blk.apply(v, x)),
                               np.asarray(x), atol=1e-6)


def test_context_block_global_context():
    """After perturbing the zero projection the added term is constant
    over space (a single pooled context vector per image)."""
    x = jnp.asarray(np.random.RandomState(1).randn(1, 6, 6, 8),
                    jnp.float32)
    blk = ContextBlock(ratio=0.5)
    v = blk.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(
        lambda a: a + 0.3 if a.ndim == 2 else a, v)
    delta = np.asarray(blk.apply(v, x) - x)        # (1, 6, 6, 8)
    spatial_var = delta.reshape(36, 8).var(axis=0)
    assert np.allclose(spatial_var, 0.0, atol=1e-10)


@pytest.mark.parametrize("att_type", ["0010", "1111"])
def test_generalized_attention_identity_at_init(att_type):
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 32),
                    jnp.float32)
    blk = GeneralizedAttention(attention_type=att_type)
    v = blk.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(blk.apply(v, x)),
                               np.asarray(x), atol=1e-6)
    # param surface matches the enabled terms
    p = v["params"]
    assert ("pos_proj" in p) == (att_type[1] == "1")
    assert ("appr_bias_conv" in p) == (att_type[2] == "1")
    assert ("pos_bias_proj" in p) == (att_type[3] == "1")


def test_attention_0010_query_independent():
    """'0010' energies depend only on keys: perturbing the value path
    changes every query position identically (same attention row)."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 16), jnp.float32)
    blk = GeneralizedAttention(attention_type="0010", num_heads=4,
                               kv_stride=1)
    v = blk.init(jax.random.PRNGKey(0), x)

    def with_proj(val):
        p = jax.tree_util.tree_map(lambda a: a, v)
        p["params"]["proj_conv"]["kernel"] = jnp.full_like(
            p["params"]["proj_conv"]["kernel"], val)
        return p

    # constant-x input => attention-weighted V identical per query
    xc = jnp.ones((1, 4, 4, 16), jnp.float32)
    out = np.asarray(blk.apply(with_proj(0.01), xc) - xc)
    flat = out.reshape(16, 16)
    assert np.allclose(flat, flat[0], atol=1e-6)


def test_gcb_resnet_structure_and_train(mesh):
    import optax

    from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
    from iif_tpu.detection.losses import DetCrossEntropyLoss
    from iif_tpu.engine.detection import DetectionTrainer

    model = MaskRCNN(num_classes=3, depth=50, frozen_stages=-1,
                     norm_eval=False, with_mask=False,
                     gcb=(False, True, True, True), gcb_ratio=0.25,
                     gen_attention="0010",
                     gen_attention_stages=(False, False, True, True))
    trainer = DetectionTrainer(
        model, DetCrossEntropyLoss(num_classes=3),
        optax.sgd(0.002, momentum=0.9), mesh,
        DetTrainCfg(rpn_nms_pre=64, rcnn_num_samples=32,
                    roi_ext="flat"))
    state = trainer.init_state((64, 64, 3))
    bb = state.params["backbone"]
    assert "gcb" in bb["layer2_0"] and "gcb" not in bb["layer1_0"]
    assert "gen_attention" in bb["layer3_0"]
    assert "gen_attention" not in bb["layer2_0"]
    batch = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32),
        "gt_boxes": jnp.asarray([[[8, 8, 40, 40]]], jnp.float32),
        "gt_labels": jnp.zeros((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
    }
    state, m0 = trainer._train_step(state, batch)
    for _ in range(5):
        state, m = trainer._train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
