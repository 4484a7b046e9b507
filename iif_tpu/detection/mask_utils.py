"""Mask encodings: COCO RLE codec + polygon rasterization.

Standalone numpy replacements for pycocotools' C mask API (the reference
depends on pycocotools/lvis-api for ann decoding at
``mmdet/datasets/coco.py`` and RLE result encoding at
``mmdet/core/mask/structures.py:1024`` / ``apis/test.py`` encode step).

Supported formats:
- uncompressed RLE: ``{"counts": [int, ...], "size": [h, w]}``
- compressed RLE: ``{"counts": str, ...}`` using COCO's LEB128-style
  base-48 varint string scheme (byte-compatible with pycocotools)
- polygons: ``[[x1, y1, x2, y2, ...], ...]`` rasterized via cv2.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np


def rle_encode(mask: np.ndarray) -> Dict:
    """Binary (H, W) mask -> compressed RLE dict (column-major order,
    matching COCO)."""
    h, w = mask.shape
    flat = np.asfortranarray(mask.astype(np.uint8)).ravel(order="F")
    # run lengths, starting with a (possibly zero-length) run of 0s
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    starts = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(starts).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    if not flat.size:
        counts = [0]
    return {"size": [h, w], "counts": _compress_counts(counts)}


def rle_decode(rle: Dict) -> np.ndarray:
    """RLE dict (compressed or raw counts) -> binary (H, W) uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _decompress_counts(counts)
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        if val:
            flat[pos:pos + c] = 1
        pos += c
        val ^= 1
    return flat.reshape((w, h)).T  # column-major


def _compress_counts(counts: Sequence[int]) -> str:
    """COCO's variable-length delta encoding (pycocotools rleToString)."""
    out = []
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and \
                not (x == -1 and (c & 0x10))
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def _decompress_counts(s: Union[str, bytes]) -> List[int]:
    if isinstance(s, bytes):
        s = s.decode("ascii")
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def polygons_to_bitmap(polygons: Sequence[Sequence[float]], h: int, w: int
                       ) -> np.ndarray:
    """Rasterize COCO polygon segmentation to a binary (H, W) mask."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    pts = [np.asarray(p, np.float64).reshape(-1, 2).round().astype(np.int32)
           for p in polygons if len(p) >= 6]
    if pts:
        cv2.fillPoly(mask, pts, 1)
    return mask


def segm_to_bitmap(segm, h: int, w: int) -> np.ndarray:
    """Any COCO segmentation (polygons / RLE / raw counts) -> bitmap."""
    if isinstance(segm, list):
        return polygons_to_bitmap(segm, h, w)
    if isinstance(segm, dict):
        return rle_decode(segm)
    raise TypeError(f"unsupported segmentation type {type(segm)}")


def mask_area(rle: Dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = _decompress_counts(counts)
    return int(sum(counts[1::2]))


def rle_iou(dt: Sequence[Dict], gt: Sequence[Dict],
            iscrowd: Sequence[bool]) -> np.ndarray:
    """Pairwise mask IoU matrix (D, G) — decode + bitwise ops. The eval
    path uses it per image on <=300 x <=G masks."""
    if not dt or not gt:
        return np.zeros((len(dt), len(gt)))
    d_masks = [rle_decode(d).astype(bool) for d in dt]
    g_masks = [rle_decode(g).astype(bool) for g in gt]
    out = np.zeros((len(dt), len(gt)))
    d_areas = [m.sum() for m in d_masks]
    g_areas = [m.sum() for m in g_masks]
    for j, gm in enumerate(g_masks):
        for i, dm in enumerate(d_masks):
            inter = np.logical_and(dm, gm).sum()
            if iscrowd[j]:
                union = d_areas[i]
            else:
                union = d_areas[i] + g_areas[j] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out
