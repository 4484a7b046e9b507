"""--fuse-conv-bn: folding frozen BN into conv kernels must leave eval
outputs numerically unchanged (reference ``tools/test.py:45-47``)."""
import jax
import jax.numpy as jnp
import numpy as np

from iif_tpu.models.fuse import fuse_conv_bn
from iif_tpu.models.resnet import resnet18


def _randomize(variables, key):
    """Random BN stats/affines so the fold is non-trivial."""
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        out.append(leaf + 0.3 * jax.random.normal(k, leaf.shape,
                                                  leaf.dtype)
                   if jnp.issubdtype(leaf.dtype, jnp.floating) else leaf)
    vs = jax.tree_util.tree_unflatten(treedef, out)
    # keep variances positive
    return jax.tree_util.tree_map(
        lambda x: jnp.abs(x) if x.ndim == 1 else x, vs)


def test_fuse_identity_classification():
    model = resnet18(num_classes=10)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    variables = _randomize(variables, jax.random.PRNGKey(2))

    ref = model.apply(variables, x, False)
    fused, n = fuse_conv_bn(variables)
    assert n >= 17  # stem + 8 basic blocks x 2 + 3 downsamples
    out = model.apply(fused, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fuse_identity_detector():
    from iif_tpu.detection.detector import MaskRCNN

    model = MaskRCNN(num_classes=3, depth=18, frozen_stages=-1)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    variables = _randomize(variables, jax.random.PRNGKey(3))

    ref = model.apply(variables, x, False,
                      method=MaskRCNN.extract_feat)
    fused, n = fuse_conv_bn(variables)
    assert n >= 17
    out = model.apply(fused, x, False, method=MaskRCNN.extract_feat)
    for lvl, (a, b) in enumerate(zip(out, ref)):
        a, b = np.asarray(a), np.asarray(b)
        # scale-relative: the randomized BN affines inflate feature
        # magnitudes, so bound the error against the level's max
        assert np.abs(a - b).max() <= 1e-4 * np.abs(b).max(), \
            f"level {lvl}"


def test_fuse_makes_bn_identity_plus_bias():
    model = resnet18(num_classes=10)
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    fused, _ = fuse_conv_bn(variables)
    bn = fused["params"]["layer1_0"]["bn1"]
    st = fused["batch_stats"]["layer1_0"]["bn1"]
    np.testing.assert_array_equal(np.asarray(bn["scale"]), 1.0)
    np.testing.assert_array_equal(np.asarray(st["mean"]), 0.0)
    np.testing.assert_allclose(np.asarray(st["var"]), 1.0 - 1e-5)
