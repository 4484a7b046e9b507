"""Image corruptions for robustness benchmarking.

Native numpy/cv2 rebuild of the corruption families the reference's
``tools/analysis_tools/test_robustness.py`` applies through the
``imagecorruptions`` package (Hendrycks & Dietterich, ICLR'19 protocol:
each corruption at severities 1-5). The subset here covers the noise /
blur / digital / weather-lite families; glass_blur / frost / snow /
elastic_transform need heavy per-pixel machinery or asset images and are
intentionally approximated or omitted (report which with
``available_corruptions()``).

All functions take/return uint8 RGB HxWx3.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

_RNG = np.random.RandomState  # deterministic per (image, severity) call


def _as_float(x):
    return x.astype(np.float32) / 255.0


def _to_uint8(x):
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


# severity constants follow the imagecorruptions parameterization
def gaussian_noise(x, severity, rng):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    return _to_uint8(_as_float(x) + rng.normal(size=x.shape) * c)


def shot_noise(x, severity, rng):
    c = [60, 25, 12, 5, 3][severity - 1]
    return _to_uint8(rng.poisson(_as_float(x) * c) / float(c))


def impulse_noise(x, severity, rng):
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    out = x.copy()
    m = rng.rand(*x.shape[:2])
    out[m < c / 2] = 0
    out[m > 1 - c / 2] = 255
    return out


def speckle_noise(x, severity, rng):
    c = [0.15, 0.2, 0.35, 0.45, 0.6][severity - 1]
    f = _as_float(x)
    return _to_uint8(f + f * rng.normal(size=x.shape) * c)


def gaussian_blur(x, severity, rng):
    import cv2

    c = [1, 2, 3, 4, 6][severity - 1]
    return cv2.GaussianBlur(x, (0, 0), sigmaX=c)


def defocus_blur(x, severity, rng):
    import cv2

    radius = [3, 4, 6, 8, 10][severity - 1]
    k = np.zeros((2 * radius + 1,) * 2, np.float32)
    yy, xx = np.mgrid[-radius:radius + 1, -radius:radius + 1]
    k[(yy ** 2 + xx ** 2) <= radius ** 2] = 1.0
    k /= k.sum()
    return cv2.filter2D(x, -1, k)


def motion_blur(x, severity, rng):
    import cv2

    size = [10, 15, 15, 15, 20][severity - 1]
    angle = rng.uniform(-45, 45)
    k = np.zeros((size, size), np.float32)
    k[size // 2, :] = 1.0 / size
    m = cv2.getRotationMatrix2D((size / 2 - 0.5, size / 2 - 0.5), angle, 1)
    k = cv2.warpAffine(k, m, (size, size))
    s = k.sum()
    if s > 0:
        k /= s
    return cv2.filter2D(x, -1, k)


def zoom_blur(x, severity, rng):
    import cv2

    zooms = {1: np.arange(1, 1.11, 0.01), 2: np.arange(1, 1.16, 0.01),
             3: np.arange(1, 1.21, 0.02), 4: np.arange(1, 1.26, 0.02),
             5: np.arange(1, 1.31, 0.03)}[severity]
    h, w = x.shape[:2]
    acc = _as_float(x).copy()
    for z in zooms[1:]:
        zh, zw = int(np.ceil(h * z)), int(np.ceil(w * z))
        zi = cv2.resize(x, (zw, zh))
        y0, x0 = (zh - h) // 2, (zw - w) // 2
        acc += _as_float(zi[y0:y0 + h, x0:x0 + w])
    return _to_uint8(acc / len(zooms))


def brightness(x, severity, rng):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    return _to_uint8(_as_float(x) + c)


def contrast(x, severity, rng):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    f = _as_float(x)
    mean = f.mean(axis=(0, 1), keepdims=True)
    return _to_uint8((f - mean) * c + mean)


def saturate(x, severity, rng):
    import cv2

    c, shift = [(0.3, 0), (0.1, 0), (2, 0), (5, 0.1), (20, 0.2)][severity - 1]
    hsv = cv2.cvtColor(x, cv2.COLOR_RGB2HSV).astype(np.float32)
    hsv[..., 1] = np.clip(hsv[..., 1] * c + shift * 255, 0, 255)
    return cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)


def pixelate(x, severity, rng):
    import cv2

    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = x.shape[:2]
    small = cv2.resize(x, (max(1, int(w * c)), max(1, int(h * c))),
                       interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_NEAREST)


def jpeg_compression(x, severity, rng):
    import cv2

    c = [25, 18, 15, 10, 7][severity - 1]
    _, enc = cv2.imencode(".jpg", cv2.cvtColor(x, cv2.COLOR_RGB2BGR),
                          [int(cv2.IMWRITE_JPEG_QUALITY), c])
    return cv2.cvtColor(cv2.imdecode(enc, cv2.IMREAD_COLOR),
                        cv2.COLOR_BGR2RGB)


def fog(x, severity, rng):
    """Plasma-free approximation: smooth low-frequency haze field."""
    import cv2

    c, blend = [(1.5, 2.0), (2.0, 2.0), (2.5, 1.7),
                (2.5, 1.5), (3.0, 1.4)][severity - 1]
    h, w = x.shape[:2]
    noise = rng.rand(max(1, h // 64), max(1, w // 64)).astype(np.float32)
    haze = cv2.resize(noise, (w, h), interpolation=cv2.INTER_CUBIC)
    f = _as_float(x)
    fogged = f + c * haze[..., None] / blend
    return _to_uint8(fogged * f.max() / max(fogged.max(), 1e-6))


CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "speckle_noise": speckle_noise,
    "gaussian_blur": gaussian_blur,
    "defocus_blur": defocus_blur,
    "motion_blur": motion_blur,
    "zoom_blur": zoom_blur,
    "brightness": brightness,
    "contrast": contrast,
    "saturate": saturate,
    "pixelate": pixelate,
    "jpeg_compression": jpeg_compression,
    "fog": fog,
}

# the reference's named groups (test_robustness.py:217-245); entries not
# implemented natively are dropped from the groups
CORRUPTION_SETS: Dict[str, List[str]] = {
    "benchmark": ["gaussian_noise", "shot_noise", "impulse_noise",
                  "defocus_blur", "motion_blur", "zoom_blur", "fog",
                  "brightness", "contrast", "pixelate",
                  "jpeg_compression"],
    "noise": ["gaussian_noise", "shot_noise", "impulse_noise"],
    "blur": ["defocus_blur", "motion_blur", "zoom_blur", "gaussian_blur"],
    "weather": ["fog", "brightness"],
    "digital": ["contrast", "pixelate", "jpeg_compression"],
    "holdout": ["speckle_noise", "gaussian_blur", "saturate"],
}


def available_corruptions() -> List[str]:
    return sorted(CORRUPTIONS)


def corrupt(image: np.ndarray, name: str, severity: int,
            seed: int = 0) -> np.ndarray:
    """Apply ``name`` at ``severity`` (1-5; 0 = identity)."""
    if severity == 0:
        return image
    if name not in CORRUPTIONS:
        raise KeyError(f"unknown corruption {name!r}; "
                       f"known: {available_corruptions()}")
    return CORRUPTIONS[name](image, int(severity), _RNG(seed))
