"""Native (C++) RLE codec vs the numpy reference implementation."""
import numpy as np
import pytest

from iif_tpu.detection.mask_utils import mask_area, rle_decode, rle_encode, rle_iou
from iif_tpu.native import (
    native_available,
    rle_decode_native,
    rle_encode_native,
    rle_iou_native,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="g++ unavailable")


def _random_masks(n, h, w, seed=0):
    rng = np.random.RandomState(seed)
    masks = []
    for _ in range(n):
        m = np.zeros((h, w), np.uint8)
        for _ in range(rng.randint(1, 4)):
            y, x = rng.randint(0, h - 8), rng.randint(0, w - 8)
            bh, bw = rng.randint(4, h - y), rng.randint(4, w - x)
            m[y:y + bh, x:x + bw] = 1
        masks.append(m)
    return masks


def test_encode_matches_numpy():
    for i, m in enumerate(_random_masks(6, 37, 53)):
        a = rle_encode(m)
        b = rle_encode_native(m)
        assert a["counts"] == b["counts"], i
        assert a["size"] == b["size"]


def test_decode_roundtrip_cross():
    for m in _random_masks(6, 41, 29, seed=3):
        rle = rle_encode(m)
        np.testing.assert_array_equal(rle_decode_native(rle), m)
        rle2 = rle_encode_native(m)
        np.testing.assert_array_equal(rle_decode(rle2), m)


def test_iou_matches_numpy():
    dts = [rle_encode(m) for m in _random_masks(5, 64, 48, seed=1)]
    gts = [rle_encode(m) for m in _random_masks(4, 64, 48, seed=2)]
    crowd = [False, True, False, False]
    a = rle_iou(dts, gts, crowd)
    b = rle_iou_native(dts, gts, crowd)
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_iou_native_is_run_based_fast():
    """Large masks: the native path must not blow up (smoke, not a timer)."""
    big = _random_masks(20, 800, 1344, seed=4)
    dts = [rle_encode_native(m) for m in big[:10]]
    gts = [rle_encode_native(m) for m in big[10:]]
    out = rle_iou_native(dts, gts, [False] * 10)
    assert out.shape == (10, 10)
    assert (out >= 0).all() and (out <= 1).all()
