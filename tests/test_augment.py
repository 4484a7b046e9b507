"""Device-side augmentation ops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.data import augment as A


def _imgs(b=4, h=32, w=32, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randint(0, 256, size=(b, h, w, 3), dtype=np.uint8))


def test_to_float_and_normalize():
    x = A.to_float(_imgs())
    assert x.dtype == jnp.float32
    assert float(x.max()) <= 1.0
    n = A.normalize(x, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))
    np.testing.assert_allclose(np.asarray(n), (np.asarray(x) - 0.5) / 0.5,
                               rtol=1e-6)


def test_random_crop_shape_and_determinism():
    x = A.to_float(_imgs())
    key = jax.random.PRNGKey(0)
    a = A.random_crop(key, x, padding=4)
    b = A.random_crop(key, x, padding=4)
    assert a.shape == x.shape
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_hflip_is_flip_or_identity():
    x = A.to_float(_imgs(b=8))
    out = np.asarray(A.random_hflip(jax.random.PRNGKey(1), x))
    xn = np.asarray(x)
    for i in range(8):
        assert (np.allclose(out[i], xn[i])
                or np.allclose(out[i], xn[i, :, ::-1, :]))


def test_cutout_zeroes_a_square():
    x = jnp.ones((2, 32, 32, 3))
    out = np.asarray(A.cutout(jax.random.PRNGKey(0), x, length=16))
    n_zero = (out == 0).all(-1).sum(axis=(1, 2))
    assert (n_zero > 0).all()
    assert (n_zero <= 17 * 17).all()  # clipped square


def test_random_resized_crop_output_size():
    x = A.to_float(_imgs(b=2, h=64, w=80))
    out = A.random_resized_crop(jax.random.PRNGKey(0), x, size=32)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_color_jitter_ranges():
    x = A.to_float(_imgs(b=2))
    out = np.asarray(A.color_jitter(jax.random.PRNGKey(0), x,
                                    0.4, 0.4, 0.4, 0.25))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_center_crop():
    x = A.to_float(_imgs(b=1, h=48, w=48))
    out = A.center_crop(x, 32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x)[:, 8:40, 8:40])


def test_cifar_train_pipeline_jits():
    x = _imgs(b=8)

    @jax.jit
    def f(key, imgs):
        return A.cifar_train_augment(key, imgs, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5))

    out = f(jax.random.PRNGKey(0), x)
    assert out.shape == (8, 32, 32, 3)


def test_autoaugment_policies_run():
    from iif_tpu.data.autoaugment import (cifar10_policy_augment,
                                          imagenet_policy_augment, randaugment)

    x = A.to_float(_imgs(b=2))
    for fn in (cifar10_policy_augment, imagenet_policy_augment, randaugment):
        out = np.asarray(fn(jax.random.PRNGKey(0), x))
        assert out.shape == x.shape
        assert np.isfinite(out).all()
        assert out.min() >= -1e-5 and out.max() <= 1.0 + 1e-5


def test_random_erasing():
    x = A.to_float(_imgs(b=4))
    out = A.random_erasing(jax.random.PRNGKey(0), x, prob=1.0)
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_simple_augment_views():
    x = _imgs(b=3)
    out = A.simple_augment_views(jax.random.PRNGKey(0), x,
                                 (0.5, 0.5, 0.5), (0.5, 0.5, 0.5),
                                 num_views=2)
    assert out.shape == (3, 3, 32, 32, 3)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
