"""ctypes bindings for the C++ greedy eval matcher (evalmatch.cpp).

Compiled on first use with g++ (cached as _evalmatch.so next to the
source); callers fall back to the pure-Python matcher in
``iif_tpu/detection/evaluation.py`` when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_evalmatch.so")
_SRC = os.path.join(_HERE, "evalmatch.cpp")

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
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.greedy_match.restype = None
    lib.greedy_match.argtypes = [p_f64, i64, i64, p_u8, p_u8,
                                 p_f64, i64, p_i64]
    lib.greedy_match_batch.restype = None
    lib.greedy_match_batch.argtypes = [
        p_f64, p_i64, p_i64, p_i64, p_i64, p_i64, i64, i64,
        p_u8, p_u8, p_u8, p_f64, i64, p_u8, p_u8]
    _lib = lib
    return lib


def eval_match_available() -> bool:
    return bool(_load())


def greedy_match_native(ious: np.ndarray, g_ignore: np.ndarray,
                        iscrowd: np.ndarray,
                        iou_thrs: np.ndarray) -> Optional[np.ndarray]:
    """(T, D) matched-gt index (-1 = unmatched), or None if the native
    library is unavailable (caller uses the Python fallback)."""
    lib = _load()
    if not lib:
        return None
    D, G = ious.shape
    T = len(iou_thrs)
    out = np.empty((T, D), np.int64)
    lib.greedy_match(
        np.ascontiguousarray(ious, np.float64), D, G,
        np.ascontiguousarray(g_ignore, np.uint8),
        np.ascontiguousarray(iscrowd, np.uint8),
        np.ascontiguousarray(iou_thrs, np.float64), T, out)
    return out


def greedy_match_batch_native(
    ious_flat: np.ndarray, iou_off: np.ndarray,
    d_cnt: np.ndarray, g_cnt: np.ndarray,
    d_off: np.ndarray, g_off: np.ndarray,
    g_ignore_flat: np.ndarray, iscrowd_flat: np.ndarray,
    dt_unmatched_ignore_flat: np.ndarray,
    iou_thrs: np.ndarray,
) -> Optional[tuple]:
    """Batched greedy match over P (img, cat) pairs in one call.

    Returns (matched, ignored) as (T, N) bool arrays with detection
    columns in pair order (N = total detections), or None when the
    native library is unavailable.
    """
    lib = _load()
    if not lib:
        return None
    P = len(d_cnt)
    N = int(d_cnt.sum())
    T = len(iou_thrs)
    matched = np.empty((T, N), np.uint8)
    ignored = np.empty((T, N), np.uint8)
    lib.greedy_match_batch(
        np.ascontiguousarray(ious_flat, np.float64),
        np.ascontiguousarray(iou_off, np.int64),
        np.ascontiguousarray(d_cnt, np.int64),
        np.ascontiguousarray(g_cnt, np.int64),
        np.ascontiguousarray(d_off, np.int64),
        np.ascontiguousarray(g_off, np.int64), P, N,
        np.ascontiguousarray(g_ignore_flat, np.uint8),
        np.ascontiguousarray(iscrowd_flat, np.uint8),
        np.ascontiguousarray(dt_unmatched_ignore_flat, np.uint8),
        np.ascontiguousarray(iou_thrs, np.float64), T, matched, ignored)
    return matched.astype(bool), ignored.astype(bool)
