"""Model-brick tests: param counts vs the reference table, head options,
feature pyramid shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.models import (
    CosNormClassifier,
    NormedLinear,
    build_classifier,
    resnet32,
    resnet50,
)


def _n_params(model, shape=(1, 32, 32, 3)):
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(shape), train=False)
    return sum(np.prod(p.shape) for p in
               jax.tree_util.tree_leaves(variables["params"]))


def test_resnet32_param_count_matches_reference():
    # exact torch count of the reference model (resnet_cifar.resnet32)
    assert _n_params(resnet32(num_classes=10)) == 464_154


def test_resnet20_param_count():
    # exact torch count of the reference model (resnet_cifar.resnet20)
    assert _n_params(build_classifier("resnet20", 10)) == 269_722


def test_resnet50_param_count():
    # torchvision resnet50: 25,557,032 params (1000 classes)
    n = _n_params(resnet50(num_classes=1000), shape=(1, 64, 64, 3))
    assert abs(n - 25_557_032) / 25_557_032 < 0.01, n


@pytest.mark.parametrize("use_norm", [None, "norm", "cosine", "lr_cosine"])
def test_head_options_forward(use_norm):
    model = resnet32(num_classes=10, use_norm=use_norm)
    x = jnp.ones((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(out)))


def test_normed_linear_is_cosine():
    layer = NormedLinear(5)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 8), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), x)
    out = np.asarray(layer.apply(v, x))
    assert np.all(np.abs(out) <= 1.0 + 1e-5)  # cosine similarity bound
    out2 = np.asarray(layer.apply(v, 10.0 * x))  # scale-invariant in x
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_cosnorm_squashing():
    layer = CosNormClassifier(5, scale=16.0)
    x = jnp.asarray(np.random.RandomState(0).randn(3, 8), jnp.float32)
    v = layer.init(jax.random.PRNGKey(0), x)
    out = np.asarray(layer.apply(v, x))
    assert np.all(np.abs(out) <= 16.0 + 1e-4)  # |s * squash * cos| <= s


def test_resnet50_feature_pyramid():
    model = resnet50(num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(variables, x, train=False, return_features=True)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]


def test_train_mode_updates_batch_stats():
    model = resnet32(num_classes=10)
    x = jnp.ones((4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_backbone_remat_grads_bit_identical():
    """ResNet.remat (jax.checkpoint on residual blocks) must not change
    gradients — only the backward's memory/compute schedule."""
    import jax
    import jax.numpy as jnp

    from iif_tpu.models.resnet import ResNet

    m0 = ResNet(layers=(2, 2, 2, 2), block="basic", frozen_stages=1,
                norm_eval=True, dtype=jnp.bfloat16)
    m1 = m0.clone(remat=True)
    v = jax.jit(m0.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3),
                    jnp.float32)

    def grads(m):
        def f(p):
            feats = m.apply({"params": p, "batch_stats": v["batch_stats"]},
                            x, True, return_features=True)
            return sum(t.astype(jnp.float32).sum() for t in feats)
        return jax.grad(f)(v["params"])

    g0, g1 = grads(m0), grads(m1)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_stem_exact():
    """Space-to-depth stem == 7x7/s2 stem: same param tree (checkpoint
    compatible), same outputs, same gradients (f32)."""
    from iif_tpu.models.resnet import ResNet

    m0 = ResNet(layers=(2, 2, 2, 2), block="basic")
    m1 = m0.clone(s2d_stem=True)
    v0 = jax.jit(m0.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), False)
    v1 = jax.jit(m1.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)), False)
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    for a, b in zip(jax.tree_util.tree_leaves(v0["params"]),
                    jax.tree_util.tree_leaves(v1["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, 96, 3),
                    jnp.float32)

    def feats_sum(m, p):
        feats = m.apply({"params": p, "batch_stats": v0["batch_stats"]},
                        x, False, return_features=True)
        return sum(t.astype(jnp.float32).sum() for t in feats), feats

    (_, f0), g0 = jax.value_and_grad(
        lambda p: feats_sum(m0, p), has_aux=True)(v0["params"])
    (_, f1), g1 = jax.value_and_grad(
        lambda p: feats_sum(m1, p), has_aux=True)(v0["params"])
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3)
