"""ctypes bindings for imgproc.cpp (glass_blur's sequential local pixel
shuffle). Compiled on first use (cached as _imgproc.so next to the
source); falls back to an exact-but-slow numpy/Python loop when no
compiler is available — the fallback matches the C++ semantics except
for the RNG stream (both are faithful to the imagecorruptions
algorithm; neither can be bit-exact with the pip package, which draws
from the global numpy RNG)."""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_imgproc.so")
_SRC = os.path.join(_HERE, "imgproc.cpp")

_lib = None


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
                       check=True, capture_output=True)
        return _SO
    except (OSError, subprocess.CalledProcessError):
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        _lib = False
        return False
    lib = ctypes.CDLL(so)
    i64 = ctypes.c_int64
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.glass_shuffle.restype = None
    lib.glass_shuffle.argtypes = [p_u8, i64, i64, i64, i64, i64,
                                  ctypes.c_uint64]
    _lib = lib
    return lib


def imgproc_native_available() -> bool:
    return bool(_load())


def glass_shuffle(img: np.ndarray, delta: int, iters: int,
                  seed: int) -> np.ndarray:
    """Sequential local pixel swap (imagecorruptions glass_blur inner
    loop): raster scan bottom-right to top-left, swapping each pixel with
    a uniform [-delta, delta) neighbour; repeated ``iters`` times."""
    out = np.ascontiguousarray(img, np.uint8).copy()
    h, w = out.shape[:2]
    ch = out.shape[2] if out.ndim == 3 else 1
    lib = _load()
    if lib:
        lib.glass_shuffle(out, h, w, ch, int(delta), int(iters),
                          np.uint64(seed or 1))
        return out
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    d = int(delta)
    for _ in range(int(iters)):
        # exact sequential semantics; slow (tests use small images)
        for y in range(h - d, d, -1):
            for x in range(w - d, d, -1):
                dy, dx = rng.randint(-d, d, size=2)
                yp, xp = y + dy, x + dx
                tmp = out[y, x].copy()
                out[y, x] = out[yp, xp]
                out[yp, xp] = tmp
    return out
