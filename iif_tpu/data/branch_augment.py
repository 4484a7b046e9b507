"""10-branch OneOf augmentation pipeline, device-side.

Rebuild of the reference's imgaug-based ``Augment``
(``classification/presets.py:46-103``): a uniform choice among ten branch
pipelines (linear-contrast+hue, grayscale+translate, motion-blur+shear,
gaussian-noise+brightness+shear, cutout+multiply, brightness+translate,
cutout+noise+scale, coarse-dropout+noise+scale, 2x identity), each a short
sequence of the primitive ops below. Branch selection is per batch
(``lax.switch``); magnitudes are per image. Input/output: float images in
[0, 1], NHWC.
"""
from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp

from iif_tpu.data.augment import cutout, random_hflip
from iif_tpu.data.autoaugment import _affine_warp, _centered, _identity_mats


def _u(key, b, lo, hi):
    return jax.random.uniform(key, (b, 1, 1, 1), minval=lo, maxval=hi)


def linear_contrast(key, x, lo=0.75, hi=1.25):
    a = _u(key, x.shape[0], lo, hi)
    return jnp.clip(0.5 + a * (x - 0.5), 0.0, 1.0)


def add_hue(key, x, max_add=50.0 / 255.0):
    """Approximate ``WithHueAndSaturation(WithChannels(0, Add))`` — shift
    hue by rotating chroma in YIQ space."""
    from iif_tpu.data.augment import color_jitter

    return color_jitter(key, x, 0, 0, 0, hue=max_add)


def grayscale_blend(key, x, lo=0.1, hi=0.3):
    a = _u(key, x.shape[0], lo, hi)
    wts = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    gray = (x * wts).sum(-1, keepdims=True)
    return x + a * (gray - x)


def translate(key, x, max_frac_y=0.0, max_frac_x=0.0):
    b, h, w, _ = x.shape
    ky, kx = jax.random.split(key)
    ty = jax.random.uniform(ky, (b,), minval=-max_frac_y, maxval=max_frac_y) * h
    tx = jax.random.uniform(kx, (b,), minval=-max_frac_x, maxval=max_frac_x) * w
    mats = _identity_mats(b).at[:, 0, 2].set(ty).at[:, 1, 2].set(tx)
    return _affine_warp(x, mats)


def shear_deg(key, x, max_deg=10.0, axis="x"):
    b, h, w, _ = x.shape
    deg = jax.random.uniform(key, (b,), minval=-max_deg, maxval=max_deg)
    v = jnp.tan(jnp.deg2rad(deg))
    mats = _identity_mats(b)
    mats = mats.at[:, 1, 0].set(v) if axis == "x" else mats.at[:, 0, 1].set(v)
    return _affine_warp(x, _centered(mats, h, w))


def scale_xy(key, x, lo=0.9, hi=1.1):
    b, h, w, _ = x.shape
    kx, ky = jax.random.split(key)
    sx = jax.random.uniform(kx, (b,), minval=lo, maxval=hi)
    sy = jax.random.uniform(ky, (b,), minval=lo, maxval=hi)
    mats = _identity_mats(b)
    mats = mats.at[:, 0, 0].set(1.0 / sy).at[:, 1, 1].set(1.0 / sx)
    return _affine_warp(x, _centered(mats, h, w))


def gaussian_noise(key, x, max_scale=15.0 / 255.0):
    k1, k2 = jax.random.split(key)
    scale = _u(k1, x.shape[0], 0.0, max_scale)
    return jnp.clip(x + scale * jax.random.normal(k2, x.shape), 0.0, 1.0)


def motion_blur(key, x, k: int = 5):
    """Horizontal/vertical box motion blur (severity-1 equivalent)."""
    b, h, w, c = x.shape
    horiz = jax.random.bernoulli(key, 0.5, (b,))
    kern_h = jnp.zeros((k, k)).at[k // 2, :].set(1.0 / k)
    kern_v = jnp.zeros((k, k)).at[:, k // 2].set(1.0 / k)

    def _conv(img, kern):
        k4 = jnp.zeros((k, k, 1, c)).at[:, :, 0, :].set(kern[:, :, None])
        return jax.lax.conv_general_dilated(
            img[None], k4, (1, 1), "SAME", feature_group_count=c,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

    blurred_h = jax.vmap(lambda im: _conv(im, kern_h))(x)
    blurred_v = jax.vmap(lambda im: _conv(im, kern_v))(x)
    return jnp.where(horiz[:, None, None, None], blurred_h, blurred_v)


def multiply_brightness(key, x, mul=(0.5, 1.5), add=(-30 / 255, 30 / 255)):
    k1, k2 = jax.random.split(key)
    m = _u(k1, x.shape[0], *mul)
    a = _u(k2, x.shape[0], *add)
    return jnp.clip(x * m + a, 0.0, 1.0)


def coarse_dropout(key, x, drop=(0.0, 0.05), size_percent=(0.02, 0.25)):
    b, h, w, _ = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    p = jax.random.uniform(k1, (b, 1, 1), minval=drop[0], maxval=drop[1])
    # coarse grid at ~size_percent resolution, upsampled
    gh, gw = max(h // 8, 1), max(w // 8, 1)
    grid = jax.random.uniform(k2, (b, gh, gw)) < p
    mask = jax.image.resize(grid.astype(x.dtype), (b, h, w), "nearest")
    return x * (1.0 - mask[..., None])


def _branches(key, x):
    b = x.shape[0]
    ks = jax.random.split(key, 4)

    def br0(a):  # contrast + flip + hue
        k, y = a
        k1, k2, k3 = jax.random.split(k, 3)
        return add_hue(k3, random_hflip(k2, linear_contrast(k1, y)))

    def br1(a):  # grayscale + flip + translate y
        k, y = a
        k1, k2, k3 = jax.random.split(k, 3)
        return translate(k3, random_hflip(k2, grayscale_blend(k1, y)),
                         max_frac_y=0.15)

    def br2(a):  # motion blur + contrast + shear x
        k, y = a
        k1, k2, k3 = jax.random.split(k, 3)
        return shear_deg(k3, linear_contrast(k2, motion_blur(k1, y),
                                             0.6, 1.4), 10.0, "x")

    def br3(a):  # noise + brightness + shear y
        k, y = a
        k1, k2, k3 = jax.random.split(k, 3)
        return shear_deg(k3, multiply_brightness(k2, gaussian_noise(k1, y)),
                         10.0, "y")

    def br4(a):  # cutout + multiply + flip
        k, y = a
        k1, k2, k3 = jax.random.split(k, 3)
        y = cutout(k1, y, length=max(y.shape[1] // 10, 2), n_holes=2,
                   fill=0.5)
        return random_hflip(k3, multiply_brightness(k2, y, (0.8, 1.2),
                                                    (0.0, 0.0)))

    def br5(a):  # brightness + contrast + translate x
        k, y = a
        k1, k2, k3 = jax.random.split(k, 3)
        return translate(k3, linear_contrast(
            k2, multiply_brightness(k1, y), 0.6, 1.4), max_frac_x=0.25)

    def br6(a):  # cutout + noise + scale
        k, y = a
        k1, k2, k3 = jax.random.split(k, 3)
        y = cutout(k1, y, length=max(y.shape[1] // 10, 2), n_holes=3,
                   fill=0.5)
        return scale_xy(k3, gaussian_noise(k2, y), 0.9, 1.1)

    def br7(a):  # coarse dropout + noise + scale
        k, y = a
        k1, k2, k3 = jax.random.split(k, 3)
        return scale_xy(k3, gaussian_noise(k2, coarse_dropout(k1, y)),
                        0.8, 1.2)

    def identity(a):
        return a[1]

    return [br0, br1, br2, br3, br4, br5, br6, br7, identity, identity]


def one_of_augment(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    """Uniform pick among the ten branches (per batch)."""
    k_sel, k_ops = jax.random.split(key)
    branches = _branches(k_ops, images)
    idx = jax.random.randint(k_sel, (), 0, len(branches))
    return jax.lax.switch(idx, branches, (k_ops, images))
