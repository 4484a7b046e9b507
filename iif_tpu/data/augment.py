"""Device-side fused augmentation — runs *inside* the jitted train step.

TPU-first replacement for the reference's PIL/torchvision transform stacks
(``classification/initialisers.py:116-139``, ``imbalanced_dataset.py:193-232``,
``presets.py``): raw uint8 batches stream to the device and every op below
fuses into the forward pass, so augmentation costs ~zero extra HBM traffic
and the host never touches pixels beyond decode.

All ops are batched, stateless (explicit PRNG keys), and static-shape.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def to_float(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 [0,255] -> float32 [0,1] (ToTensor)."""
    return images.astype(jnp.float32) / 255.0


def normalize(images: jnp.ndarray, mean: Sequence[float],
              std: Sequence[float]) -> jnp.ndarray:
    mean = jnp.asarray(mean, images.dtype)
    std = jnp.asarray(std, images.dtype)
    return (images - mean) / std


def random_hflip(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
    flip = jax.random.bernoulli(key, 0.5, (images.shape[0],))
    return jnp.where(flip[:, None, None, None], images[:, :, ::-1, :], images)


def random_crop(key: jax.Array, images: jnp.ndarray,
                padding: int = 4) -> jnp.ndarray:
    """torch RandomCrop(H, padding): zero-pad then random HxW window."""
    b, h, w, c = images.shape
    padded = jnp.pad(images, ((0, 0), (padding, padding),
                              (padding, padding), (0, 0)))
    ky, kx = jax.random.split(key)
    oy = jax.random.randint(ky, (b,), 0, 2 * padding + 1)
    ox = jax.random.randint(kx, (b,), 0, 2 * padding + 1)

    def _crop(img, y, x):
        return jax.lax.dynamic_slice(img, (y, x, 0), (h, w, c))

    return jax.vmap(_crop)(padded, oy, ox)


def cutout(key: jax.Array, images: jnp.ndarray, length: int = 16,
           n_holes: int = 1, fill: float = 0.0) -> jnp.ndarray:
    """Cutout (reference ``presets.py:158-195``): zero a clipped square of
    side ``length`` centered at a uniform pixel."""
    b, h, w, _ = images.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    out = images
    for hole in range(n_holes):
        ky, kx = jax.random.split(jax.random.fold_in(key, hole))
        cy = jax.random.randint(ky, (b,), 0, h)
        cx = jax.random.randint(kx, (b,), 0, w)
        mask = ((jnp.abs(yy[None] - cy[:, None, None]) <= length // 2)
                & (jnp.abs(xx[None] - cx[:, None, None]) <= length // 2))
        out = jnp.where(mask[..., None], fill, out)
    return out


def random_erasing(key: jax.Array, images: jnp.ndarray, prob: float = 0.5,
                   scale=(0.02, 0.33), ratio=(0.3, 3.3)) -> jnp.ndarray:
    """torchvision RandomErasing (the `--random-erase` flag): erase a random
    area-scaled rectangle with random values."""
    b, h, w, c = images.shape
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    apply = jax.random.bernoulli(k1, prob, (b,))
    area = h * w * jax.random.uniform(k2, (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k3, (b,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    eh = jnp.clip(jnp.sqrt(area * r).astype(jnp.int32), 1, h)
    ew = jnp.clip(jnp.sqrt(area / r).astype(jnp.int32), 1, w)
    cy = (jax.random.uniform(k4, (b,)) * (h - eh)).astype(jnp.int32)
    cx = (jax.random.uniform(k5, (b,)) * (w - ew)).astype(jnp.int32)
    noise = jax.random.normal(k6, images.shape, images.dtype)
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
    inside = ((yy >= cy[:, None, None]) & (yy < (cy + eh)[:, None, None])
              & (xx >= cx[:, None, None]) & (xx < (cx + ew)[:, None, None]))
    inside = inside & apply[:, None, None]
    return jnp.where(inside[..., None], noise, images)


# ---------------------------------------------------------------- geometric
def random_resized_crop(
    key: jax.Array, images: jnp.ndarray, size: int = 224,
    scale: Tuple[float, float] = (0.08, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
) -> jnp.ndarray:
    """RandomResizedCrop as a single fused scale-and-translate (bilinear).

    Samples target area in ``scale``·area and log-uniform aspect in
    ``ratio`` (torch semantics), clamps the box to the image instead of
    torch's 10-attempt rejection loop (jit demands static control flow; the
    clamp changes the box distribution only for extreme aspect draws).
    """
    b, h, w, _ = images.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    area = h * w * jax.random.uniform(k1, (b,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k2, (b,), minval=jnp.log(ratio[0]),
                               maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    cw = jnp.clip(jnp.sqrt(area * r), 8.0, w)
    ch = jnp.clip(jnp.sqrt(area / r), 8.0, h)
    y0 = jax.random.uniform(k3, (b,)) * (h - ch)
    x0 = jax.random.uniform(k4, (b,)) * (w - cw)

    def _one(img, y0i, x0i, chi, cwi):
        sy = size / chi
        sx = size / cwi
        return jax.image.scale_and_translate(
            img, (size, size, img.shape[-1]), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([-y0i * sy, -x0i * sx]),
            method="bilinear")

    return jax.vmap(_one)(images, y0, x0, ch, cw)


def resize_bilinear(images: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    b, _, _, c = images.shape
    return jax.image.resize(images, (b, size[0], size[1], c), method="bilinear")


def center_crop(images: jnp.ndarray, size: int) -> jnp.ndarray:
    _, h, w, _ = images.shape
    y0 = (h - size) // 2
    x0 = (w - size) // 2
    return images[:, y0:y0 + size, x0:x0 + size, :]


# -------------------------------------------------------------- photometric
def _rgb_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    wts = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return (x * wts).sum(-1, keepdims=True)


def color_jitter(key: jax.Array, images: jnp.ndarray, brightness: float = 0.4,
                 contrast: float = 0.4, saturation: float = 0.4,
                 hue: float = 0.0) -> jnp.ndarray:
    """ColorJitter on [0,1] images. Factors ~ U[max(0,1-v), 1+v] per image
    (torch convention); ops applied in fixed b->c->s->h order (torch
    randomizes the order — statistically equivalent for training)."""
    b = images.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    out = images
    if brightness > 0:
        f = jax.random.uniform(k1, (b, 1, 1, 1), minval=max(0, 1 - brightness),
                               maxval=1 + brightness)
        out = out * f
    if contrast > 0:
        f = jax.random.uniform(k2, (b, 1, 1, 1), minval=max(0, 1 - contrast),
                               maxval=1 + contrast)
        mean = _rgb_to_gray(out).mean(axis=(1, 2), keepdims=True)
        out = mean + (out - mean) * f
    if saturation > 0:
        f = jax.random.uniform(k3, (b, 1, 1, 1), minval=max(0, 1 - saturation),
                               maxval=1 + saturation)
        gray = _rgb_to_gray(out)
        out = gray + (out - gray) * f
    if hue > 0:
        # Hue rotation in YIQ space (equivalent to HSV hue shift for small
        # angles, one fused matmul instead of RGB<->HSV branching).
        theta = jax.random.uniform(k4, (b, 1, 1), minval=-hue, maxval=hue)
        theta = theta * 2.0 * jnp.pi
        yiq_from_rgb = jnp.asarray([[0.299, 0.587, 0.114],
                                    [0.596, -0.274, -0.322],
                                    [0.211, -0.523, 0.312]], out.dtype)
        rgb_from_yiq = jnp.linalg.inv(yiq_from_rgb)
        yiq = jnp.einsum("bhwc,dc->bhwd", out, yiq_from_rgb)
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        i, q = yiq[..., 1], yiq[..., 2]
        yiq = jnp.stack([yiq[..., 0], cos * i - sin * q, sin * i + cos * q],
                        axis=-1)
        out = jnp.einsum("bhwd,cd->bhwc", yiq, rgb_from_yiq)
    return jnp.clip(out, 0.0, 1.0)


def random_grayscale(key: jax.Array, images: jnp.ndarray,
                     prob: float = 0.2) -> jnp.ndarray:
    b = images.shape[0]
    apply = jax.random.bernoulli(key, prob, (b,))
    gray = jnp.broadcast_to(_rgb_to_gray(images), images.shape)
    return jnp.where(apply[:, None, None, None], gray, images)


# ------------------------------------------------------------ full pipelines
def cifar_train_augment(key: jax.Array, images_u8: jnp.ndarray,
                        mean, std, use_policy: bool = False,
                        cutout_len: int = 16, use_oneof: bool = False,
                        random_erase: float = 0.0) -> jnp.ndarray:
    """RandomCrop(32,4) + HFlip [+ CIFAR policy + Cutout] + Normalize
    (reference ``initialisers.py:120-133``). ``use_oneof`` swaps in the
    imgaug 10-branch pipeline (reference ``presets.py:46-103`` Augment,
    which normalizes with CIFAR stats); ``random_erase`` appends
    RandomErasing."""
    k_crop, k_flip, k_pol, k_cut, k_re = jax.random.split(key, 5)
    x = to_float(images_u8)
    if use_oneof:
        from iif_tpu.data.branch_augment import one_of_augment

        x = one_of_augment(k_pol, x)
    else:
        x = random_crop(k_crop, x, padding=4)
        x = random_hflip(k_flip, x)
        if use_policy:
            from iif_tpu.data.autoaugment import cifar10_policy_augment

            x = cifar10_policy_augment(k_pol, x)
            x = cutout(k_cut, x, length=cutout_len)
    x = normalize(x, mean, std)
    if random_erase > 0:
        x = random_erasing(k_re, x, prob=random_erase)
    return x


def cifar_eval_transform(images_u8: jnp.ndarray, mean, std) -> jnp.ndarray:
    return normalize(to_float(images_u8), mean, std)


def imagenet_train_augment(key: jax.Array, images_u8: jnp.ndarray, mean, std,
                           size: int = 224, hue: float = 0.0,
                           auto_augment: str | None = None,
                           random_erase: float = 0.0) -> jnp.ndarray:
    """RandomResizedCrop(224) + HFlip + ColorJitter(0.4,0.4,0.4,hue) +
    Normalize (reference ``imbalanced_dataset.py:193-225``); hue=0.25 for
    iNat18. ``auto_augment`` in {'imagenet','randaugment','oneof'} swaps
    ColorJitter for a policy ('oneof' = the imgaug 10-branch pipeline);
    ``random_erase`` > 0 adds RandomErasing after normalization (the
    torchvision `--random-erase` recipe)."""
    k_rrc, k_flip, k_cj, k_re = jax.random.split(key, 4)
    x = to_float(images_u8)
    x = random_resized_crop(k_rrc, x, size=size)
    x = random_hflip(k_flip, x)
    if auto_augment == "randaugment":
        from iif_tpu.data.autoaugment import randaugment

        x = randaugment(k_cj, x)
    elif auto_augment == "imagenet":
        from iif_tpu.data.autoaugment import imagenet_policy_augment

        x = imagenet_policy_augment(k_cj, x)
    elif auto_augment == "oneof":
        from iif_tpu.data.branch_augment import one_of_augment

        x = one_of_augment(k_cj, x)
    else:
        x = color_jitter(k_cj, x, 0.4, 0.4, 0.4, hue)
    x = normalize(x, mean, std)
    if random_erase > 0:
        x = random_erasing(k_re, x, prob=random_erase)
    return x


def simple_augment_views(key: jax.Array, images_u8: jnp.ndarray, mean, std,
                         num_views: int = 2) -> jnp.ndarray:
    """SimpleAugment (reference ``presets.py:124-156``): an anchor view +
    N stochastic views (grayscale-prob + crop + flip) per image.
    Returns (V+1, B, H, W, C) — view 0 is the anchor."""
    x = to_float(images_u8)
    k_anchor, *k_views = jax.random.split(key, num_views + 1)
    ka1, ka2, ka3 = jax.random.split(k_anchor, 3)
    anchor = normalize(random_hflip(
        ka3, random_crop(ka2, random_grayscale(ka1, x), 4)), mean, std)
    views = [anchor]
    for kv in k_views:
        kv1, kv2, kv3 = jax.random.split(kv, 3)
        views.append(normalize(random_hflip(
            kv3, random_crop(kv2, random_grayscale(kv1, x), 4)), mean, std))
    return jnp.stack(views)


def imagenet_eval_transform(images_u8: jnp.ndarray, mean, std,
                            size: int = 224, resize_to: int = 256) -> jnp.ndarray:
    """Resize(256) + CenterCrop(224) + Normalize. Assumes host already
    resized the short side to ``resize_to`` (fixed-shape batches)."""
    x = to_float(images_u8)
    if x.shape[1] != size or x.shape[2] != size:
        x = center_crop(x, size)
    return normalize(x, mean, std)
