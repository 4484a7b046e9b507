"""AutoAugment / RandAugment policies, fully on device.

TPU-native replacement for the reference's host-side `randaugment` package
(``CIFAR10Policy`` / ``ImageNetPolicy`` / ``RandAugment`` imported at
``classification/imbalanced_dataset.py:10`` and applied per-PIL-image in
DataLoader workers). Here the full op set (shear/translate/rotate via one
fused bilinear warp, plus the photometric ops) runs batched inside the
jitted train step.

Design deltas vs the PIL implementation (all jit-driven):
- sub-policy choice is per *batch* (``lax.switch``) rather than per image —
  probs, magnitudes and directions stay per image where meaningful;
- `equalize` uses a 256-bin histogram computed with a one-hot matmul (MXU)
  instead of PIL's LUT;
- geometric fills use mid-gray 0.5 like the standard AutoAugment impl.

Images are float in [0,1], NHWC.
"""
from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_FILL = 0.5
_LEVELS = 10


# ------------------------------------------------------------------ warping
def _affine_warp(images: jnp.ndarray, mats: jnp.ndarray) -> jnp.ndarray:
    """Apply per-image inverse affine matrices (B,2,3): out(y,x) =
    in(M @ [y,x,1]). Bilinear, mid-gray fill."""
    b, h, w, c = images.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ones = jnp.ones_like(yy)
    coords = jnp.stack([yy, xx, ones], axis=0).reshape(3, -1)  # (3, HW)

    def _one(img, m):
        src = m @ coords  # (2, HW)
        sy, sx = src[0], src[1]
        inside = ((sy >= 0) & (sy <= h - 1) & (sx >= 0) & (sx <= w - 1))

        def _chan(ch):
            vals = jax.scipy.ndimage.map_coordinates(
                ch, [sy, sx], order=1, mode="constant", cval=_FILL)
            return jnp.where(inside, vals, _FILL)

        out = jax.vmap(_chan, in_axes=-1, out_axes=-1)(img)
        return out.reshape(h, w, c)

    return jax.vmap(_one)(images, mats)


def _centered(mats: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Conjugate (B,2,2)+(B,2) affine by the image-center translation."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    center = jnp.asarray([cy, cx])
    A, t = mats[:, :, :2], mats[:, :, 2]
    t = t + center[None] - jnp.einsum("bij,j->bi", A, center)
    return jnp.concatenate([A, t[:, :, None]], axis=-1)


def _identity_mats(b: int) -> jnp.ndarray:
    eye = jnp.concatenate([jnp.eye(2), jnp.zeros((2, 1))], axis=1)
    return jnp.broadcast_to(eye, (b, 2, 3))


# ------------------------------------------------------ individual operations
# Each op: (key, images, level:int in [0,10), signed: random direction) -> images
def _signs(key, b):
    return jnp.where(jax.random.bernoulli(key, 0.5, (b,)), 1.0, -1.0)


def shear_x(key, x, level):
    b, h, w, _ = x.shape
    v = 0.3 * level / (_LEVELS - 1) * _signs(key, b)
    mats = _identity_mats(b)
    mats = mats.at[:, 1, 0].set(v)  # src_x += v * y  (inverse shear)
    return _affine_warp(x, _centered(mats, h, w))


def shear_y(key, x, level):
    b, h, w, _ = x.shape
    v = 0.3 * level / (_LEVELS - 1) * _signs(key, b)
    mats = _identity_mats(b)
    mats = mats.at[:, 0, 1].set(v)
    return _affine_warp(x, _centered(mats, h, w))


def translate_x(key, x, level, max_frac=150.0 / 331.0):
    b, h, w, _ = x.shape
    v = max_frac * w * level / (_LEVELS - 1) * _signs(key, b)
    mats = _identity_mats(b).at[:, 1, 2].set(v)
    return _affine_warp(x, mats)


def translate_y(key, x, level, max_frac=150.0 / 331.0):
    b, h, w, _ = x.shape
    v = max_frac * h * level / (_LEVELS - 1) * _signs(key, b)
    mats = _identity_mats(b).at[:, 0, 2].set(v)
    return _affine_warp(x, mats)


def rotate(key, x, level):
    b, h, w, _ = x.shape
    deg = 30.0 * level / (_LEVELS - 1) * _signs(key, b)
    th = jnp.deg2rad(deg)
    cos, sin = jnp.cos(th), jnp.sin(th)
    mats = _identity_mats(b)
    mats = mats.at[:, 0, 0].set(cos).at[:, 0, 1].set(-sin)
    mats = mats.at[:, 1, 0].set(sin).at[:, 1, 1].set(cos)
    return _affine_warp(x, _centered(mats, h, w))


def _blend(a, b, factor):
    return jnp.clip(a + (b - a) * factor, 0.0, 1.0)


def _enh_factor(key, b, level):
    """Enhancement factor 1 ± 0.9*level/9 (AutoAugment convention)."""
    return 1.0 + 0.9 * level / (_LEVELS - 1) * _signs(key, b)


def color(key, x, level):
    f = _enh_factor(key, x.shape[0], level)[:, None, None, None]
    gray = (x * jnp.asarray([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    return _blend(jnp.broadcast_to(gray, x.shape), x, f)


def contrast(key, x, level):
    f = _enh_factor(key, x.shape[0], level)[:, None, None, None]
    gray = (x * jnp.asarray([0.299, 0.587, 0.114])).sum(-1, keepdims=True)
    mean = gray.mean(axis=(1, 2, 3), keepdims=True)
    return _blend(jnp.broadcast_to(mean, x.shape), x, f)


def brightness(key, x, level):
    f = _enh_factor(key, x.shape[0], level)[:, None, None, None]
    return _blend(jnp.zeros_like(x), x, f)


def sharpness(key, x, level):
    f = _enh_factor(key, x.shape[0], level)[:, None, None, None]
    kernel = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    c = x.shape[-1]
    k4 = jnp.zeros((3, 3, 1, c)).at[:, :, 0, :].set(kernel[:, :, None])
    smooth = jax.lax.conv_general_dilated(
        x, k4, (1, 1), "SAME", feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _blend(smooth, x, f)


def autocontrast(key, x, level):
    lo = x.min(axis=(1, 2), keepdims=True)
    hi = x.max(axis=(1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / (hi - lo + 1e-12), 1.0)
    off = jnp.where(hi > lo, lo, 0.0)
    return jnp.clip((x - off) * scale, 0.0, 1.0)


def equalize(key, x, level):
    """Per-channel histogram equalization (PIL semantics) via one-hot
    histogram — an MXU matmul, not a scatter."""
    b, h, w, c = x.shape
    xi = jnp.clip((x * 255.0).astype(jnp.int32), 0, 255)

    def _chan(img):  # (H, W) int
        onehot = jax.nn.one_hot(img.reshape(-1), 256, dtype=jnp.float32)
        hist = onehot.sum(0)
        step = (hist.sum() - hist[255]) / 255.0
        cdf = jnp.cumsum(hist)
        lut = jnp.where(step > 0,
                        jnp.clip(((cdf - hist) / jnp.maximum(step, 1e-8)
                                  + 0.5).astype(jnp.int32), 0, 255),
                        jnp.arange(256))
        return lut[img.reshape(-1)].reshape(img.shape)

    out = jax.vmap(jax.vmap(_chan, in_axes=-1, out_axes=-1))(xi)
    return out.astype(x.dtype) / 255.0


def invert(key, x, level):
    return 1.0 - x


def posterize(key, x, level):
    bits = jnp.round(8 - 4 * level / (_LEVELS - 1)).astype(jnp.int32)
    shift = (8 - bits).astype(jnp.uint8)
    xi = (x * 255.0).astype(jnp.uint8)
    xi = jax.lax.shift_left(jax.lax.shift_right_logical(xi, shift), shift)
    return xi.astype(x.dtype) / 255.0


def solarize(key, x, level):
    thresh = (256.0 - 256.0 * level / (_LEVELS - 1)) / 255.0
    return jnp.where(x >= thresh, 1.0 - x, x)


def identity_op(key, x, level):
    return x


_OPS = {
    "shearX": shear_x, "shearY": shear_y,
    "translateX": partial(translate_x, max_frac=150.0 / 331.0),
    "translateY": partial(translate_y, max_frac=150.0 / 331.0),
    "rotate": rotate, "color": color, "posterize": posterize,
    "solarize": solarize, "contrast": contrast, "sharpness": sharpness,
    "brightness": brightness, "autocontrast": autocontrast,
    "equalize": equalize, "invert": invert, "identity": identity_op,
}

# AutoAugment CIFAR-10 policy (25 sub-policies of 2 (op, prob, level) each).
CIFAR10_POLICY: List[Tuple] = [
    (("invert", 0.1, 7), ("contrast", 0.2, 6)),
    (("rotate", 0.7, 2), ("translateX", 0.3, 9)),
    (("sharpness", 0.8, 1), ("sharpness", 0.9, 3)),
    (("shearY", 0.5, 8), ("translateY", 0.7, 9)),
    (("autocontrast", 0.5, 8), ("equalize", 0.9, 2)),
    (("shearY", 0.2, 7), ("posterize", 0.3, 7)),
    (("color", 0.4, 3), ("brightness", 0.6, 7)),
    (("sharpness", 0.3, 9), ("brightness", 0.7, 9)),
    (("equalize", 0.6, 5), ("equalize", 0.5, 1)),
    (("contrast", 0.6, 7), ("sharpness", 0.6, 5)),
    (("color", 0.7, 7), ("translateX", 0.5, 8)),
    (("equalize", 0.3, 7), ("autocontrast", 0.4, 8)),
    (("translateY", 0.4, 3), ("sharpness", 0.2, 6)),
    (("brightness", 0.9, 6), ("color", 0.2, 8)),
    (("solarize", 0.5, 2), ("invert", 0.0, 3)),
    (("equalize", 0.2, 0), ("autocontrast", 0.6, 0)),
    (("equalize", 0.2, 8), ("equalize", 0.6, 4)),
    (("color", 0.9, 9), ("equalize", 0.6, 6)),
    (("autocontrast", 0.8, 4), ("solarize", 0.2, 8)),
    (("brightness", 0.1, 3), ("color", 0.7, 0)),
    (("solarize", 0.4, 5), ("autocontrast", 0.9, 3)),
    (("translateY", 0.9, 9), ("translateY", 0.7, 9)),
    (("autocontrast", 0.9, 2), ("solarize", 0.8, 3)),
    (("equalize", 0.8, 8), ("invert", 0.1, 3)),
    (("translateY", 0.7, 9), ("autocontrast", 0.9, 1)),
]

# AutoAugment ImageNet policy.
IMAGENET_POLICY: List[Tuple] = [
    (("posterize", 0.4, 8), ("rotate", 0.6, 9)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
    (("posterize", 0.6, 7), ("posterize", 0.6, 6)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("equalize", 0.4, 4), ("rotate", 0.8, 8)),
    (("solarize", 0.6, 3), ("equalize", 0.6, 7)),
    (("posterize", 0.8, 5), ("equalize", 1.0, 2)),
    (("rotate", 0.2, 3), ("solarize", 0.6, 8)),
    (("equalize", 0.6, 8), ("posterize", 0.4, 6)),
    (("rotate", 0.8, 8), ("color", 0.4, 0)),
    (("rotate", 0.4, 9), ("equalize", 0.6, 2)),
    (("equalize", 0.0, 7), ("equalize", 0.8, 8)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("rotate", 0.8, 8), ("color", 1.0, 2)),
    (("color", 0.8, 8), ("solarize", 0.8, 7)),
    (("sharpness", 0.4, 7), ("invert", 0.6, 8)),
    (("shearX", 0.6, 5), ("equalize", 1.0, 9)),
    (("color", 0.4, 0), ("equalize", 0.6, 3)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
]


def _apply_policy(key: jax.Array, images: jnp.ndarray,
                  policy: List[Tuple]) -> jnp.ndarray:
    """Pick one sub-policy for the batch; apply its two ops with their
    per-image probabilities."""
    k_sel, k_ops = jax.random.split(key)

    def _make_branch(sub):
        def _branch(args):
            kk, x = args
            for i, (name, prob, level) in enumerate(sub):
                k_p, k_op, kk = jax.random.split(jax.random.fold_in(kk, i), 3)
                applied = _OPS[name](k_op, x, level)
                do = jax.random.bernoulli(k_p, prob, (x.shape[0],))
                x = jnp.where(do[:, None, None, None], applied, x)
            return x
        return _branch

    branches = [_make_branch(sub) for sub in policy]
    idx = jax.random.randint(k_sel, (), 0, len(policy))
    return jax.lax.switch(idx, branches, (k_ops, images))


def cifar10_policy_augment(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    return _apply_policy(key, images, CIFAR10_POLICY)


def imagenet_policy_augment(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    return _apply_policy(key, images, IMAGENET_POLICY)


_RANDAUG_OPS = ["identity", "autocontrast", "equalize", "rotate", "solarize",
                "color", "posterize", "contrast", "brightness", "sharpness",
                "shearX", "shearY", "translateX", "translateY"]


def randaugment(key: jax.Array, images: jnp.ndarray, num_ops: int = 2,
                magnitude: int = 9) -> jnp.ndarray:
    """RandAugment(N=2, M=9): N ops drawn uniformly per batch."""
    x = images
    for i in range(num_ops):
        k_sel, k_op = jax.random.split(jax.random.fold_in(key, i))
        branches = [
            (lambda name: lambda args: _OPS[name](args[0], args[1], magnitude))(n)
            for n in _RANDAUG_OPS
        ]
        idx = jax.random.randint(k_sel, (), 0, len(_RANDAUG_OPS))
        x = jax.lax.switch(idx, branches, (k_op, x))
    return x
