"""ctypes bindings for the C++ RLE codec (rle.cpp).

Compiled on first import with g++ (cached as _rle.so next to the source);
falls back to the pure-numpy implementations in
``iif_tpu/detection/mask_utils.py`` when no compiler is available. The
run-intersection IoU never decodes masks — O(runs) instead of O(pixels),
the difference between minutes and hours for LVIS segm eval.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_rle.so")
_SRC = os.path.join(_HERE, "rle.cpp")

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
    lib.rle_decompress_counts.restype = i64
    lib.rle_decompress_counts.argtypes = [ctypes.c_char_p, i64, p_i64, i64]
    lib.rle_compress_counts.restype = i64
    lib.rle_compress_counts.argtypes = [p_i64, i64, ctypes.c_char_p, i64]
    lib.rle_encode_mask.restype = i64
    lib.rle_encode_mask.argtypes = [p_u8, i64, i64, p_i64, i64]
    lib.rle_decode_mask.restype = None
    lib.rle_decode_mask.argtypes = [p_i64, i64, i64, i64, p_u8]
    lib.rle_iou_matrix.restype = None
    lib.rle_iou_matrix.argtypes = [p_i64, p_i64, p_i64, i64,
                                   p_i64, p_i64, p_i64, i64, p_u8, p_f64]
    _lib = lib
    return lib


def native_available() -> bool:
    return bool(_load())


def _counts_of(rle: Dict) -> np.ndarray:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        lib = _load()
        s = counts.encode("ascii") if isinstance(counts, str) else counts
        buf = np.empty(len(s) + 2, np.int64)
        n = lib.rle_decompress_counts(s, len(s), buf, buf.size)
        if n < 0:
            raise ValueError("RLE counts overflow")
        return buf[:n]
    return np.asarray(counts, np.int64)


def rle_encode_native(mask: np.ndarray) -> Dict:
    lib = _load()
    if not lib:
        from iif_tpu.detection.mask_utils import rle_encode

        return rle_encode(mask)
    h, w = mask.shape
    m = np.ascontiguousarray(mask, np.uint8)
    counts = np.empty(h * w + 2, np.int64)
    n = lib.rle_encode_mask(m, h, w, counts, counts.size)
    out = ctypes.create_string_buffer(int(6 * n + 16))
    m2 = lib.rle_compress_counts(counts[:n].copy(), n, out, len(out))
    if m2 < 0:
        raise ValueError("RLE compress overflow")
    return {"size": [h, w], "counts": out.raw[:m2].decode("ascii")}


def rle_decode_native(rle: Dict) -> np.ndarray:
    lib = _load()
    if not lib:
        from iif_tpu.detection.mask_utils import rle_decode

        return rle_decode(rle)
    h, w = rle["size"]
    counts = np.ascontiguousarray(_counts_of(rle))
    mask = np.empty((h, w), np.uint8)
    lib.rle_decode_mask(counts, len(counts), h, w, mask)
    return mask


def rle_iou_native(dt: Sequence[Dict], gt: Sequence[Dict],
                   iscrowd: Sequence[bool]) -> np.ndarray:
    lib = _load()
    if not lib or not dt or not gt:
        from iif_tpu.detection.mask_utils import rle_iou

        return rle_iou(dt, gt, iscrowd)

    def _flatten(rles):
        counts = [np.ascontiguousarray(_counts_of(r)) for r in rles]
        lens = np.asarray([len(c) for c in counts], np.int64)
        offsets = np.concatenate([[0], np.cumsum(lens)])[:-1].astype(np.int64)
        flat = (np.concatenate(counts) if counts
                else np.zeros(0, np.int64)).astype(np.int64)
        return np.ascontiguousarray(flat), offsets, lens

    d_flat, d_off, d_len = _flatten(dt)
    g_flat, g_off, g_len = _flatten(gt)
    crowd = np.asarray(iscrowd, np.uint8)
    out = np.zeros((len(dt), len(gt)), np.float64)
    lib.rle_iou_matrix(d_flat, d_off, d_len, len(dt),
                       g_flat, g_off, g_len, len(gt), crowd, out)
    return out
