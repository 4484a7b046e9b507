"""BitmapMasks / PolygonMasks structure API
(reference ``mmdet/core/mask/structures.py:193,533``): geometry ops,
conversions, and bitmap<->polygon consistency."""
import numpy as np
import pytest

from iif_tpu.detection.mask_structures import BitmapMasks, PolygonMasks


@pytest.fixture
def bm():
    return BitmapMasks.random(num_masks=4, height=28, width=36)


@pytest.fixture
def pm():
    return PolygonMasks.random(num_masks=3, height=40, width=48)


# ----------------------------------------------------------------- bitmap
def test_bitmap_basic(bm):
    assert len(bm) == 4
    assert bm.to_ndarray().shape == (4, 28, 36)
    assert bm[1].to_ndarray().shape == (1, 28, 36)
    assert bm[np.array([0, 2])].to_ndarray().shape == (2, 28, 36)
    assert (bm.areas == bm.masks.sum((1, 2))).all()
    assert bm.to_tensor().shape == (4, 28, 36)
    assert "num_masks=4" in repr(bm)


def test_bitmap_resize_rescale(bm):
    r = bm.resize((56, 72))
    assert r.to_ndarray().shape == (4, 56, 72)
    # nearest upscale preserves mass ratio ~4x
    assert r.areas.sum() == pytest.approx(4 * bm.areas.sum(), rel=0.1)
    rs = bm.rescale(2.0)
    assert (rs.height, rs.width) == (56, 72)
    cap = bm.rescale((100, 30))  # (long, short) cap, aspect kept
    assert max(cap.height, cap.width) <= 100


def test_bitmap_flip_involution(bm):
    for d in ("horizontal", "vertical", "diagonal"):
        f2 = bm.flip(d).flip(d)
        np.testing.assert_array_equal(f2.to_ndarray(), bm.to_ndarray())
    fh = bm.flip("horizontal")
    np.testing.assert_array_equal(fh.to_ndarray(),
                                  bm.to_ndarray()[:, :, ::-1])


def test_bitmap_pad_crop_expand(bm):
    p = bm.pad((40, 40), pad_val=0)
    assert p.to_ndarray().shape == (4, 40, 40)
    assert p.areas.sum() == bm.areas.sum()
    c = bm.crop(np.array([5, 4, 20, 21]))
    assert (c.height, c.width) == (17, 15)
    np.testing.assert_array_equal(c.to_ndarray(),
                                  bm.to_ndarray()[:, 4:21, 5:20])
    e = bm.expand(50, 60, 10, 12)
    assert e.to_ndarray().shape == (4, 50, 60)
    np.testing.assert_array_equal(e.to_ndarray()[:, 10:38, 12:48],
                                  bm.to_ndarray())


def test_bitmap_crop_and_resize(bm):
    boxes = np.array([[2.0, 2.0, 30.0, 24.0], [0.0, 0.0, 36.0, 28.0]],
                     np.float32)
    inds = np.array([1, 3])
    out = bm.crop_and_resize(boxes, (14, 14), inds)
    assert out.to_ndarray().shape == (2, 14, 14)
    # full-image box downsampled must keep rough fill fraction
    frac_src = bm.masks[3].mean()
    frac_out = out.masks[1].mean()
    assert abs(frac_src - frac_out) < 0.25


def test_bitmap_translate_shear_rotate(bm):
    t = bm.translate((28, 36), 5, "horizontal")
    np.testing.assert_array_equal(t.to_ndarray()[:, :, 5:],
                                  bm.to_ndarray()[:, :, :-5])
    assert t.to_ndarray()[:, :, :5].sum() == 0
    tv = bm.translate((28, 36), 3, "vertical")
    np.testing.assert_array_equal(tv.to_ndarray()[:, 3:, :],
                                  bm.to_ndarray()[:, :-3, :])
    s = bm.shear((28, 36), 0.3)
    assert s.to_ndarray().shape == (4, 28, 36)
    r = bm.rotate((28, 36), 180.0)
    # 180-degree rotation about the exact center = double flip
    np.testing.assert_array_equal(
        r.to_ndarray(), bm.flip("diagonal").to_ndarray())


def test_bitmap_empty():
    em = BitmapMasks([], 10, 12)
    assert len(em) == 0
    for out in (em.resize((5, 6)), em.flip(), em.pad((20, 20)),
                em.crop(np.array([0, 0, 4, 4])),
                em.crop_and_resize(np.zeros((0, 4)), (7, 7),
                                   np.zeros(0, np.int64)),
                em.expand(20, 20, 2, 2), em.translate((10, 12), 2),
                em.rotate((10, 12), 30.0)):
        assert len(out) == 0


# ---------------------------------------------------------------- polygon
def test_polygon_basic(pm):
    assert len(pm) == 3
    nd = pm.to_ndarray()
    assert nd.shape == (3, 40, 48)
    assert pm[0].to_ndarray().shape == (1, 40, 48)
    assert pm[np.array([0, 2])].to_ndarray().shape == (2, 40, 48)
    bm2 = pm.to_bitmap()
    np.testing.assert_array_equal(bm2.to_ndarray(), nd)
    # shoelace area ~ raster area
    np.testing.assert_allclose(pm.areas, bm2.areas, rtol=0.3, atol=8)


def test_polygon_resize_flip_crop(pm):
    r = pm.resize((80, 96))
    assert (r.height, r.width) == (80, 96)
    np.testing.assert_allclose(r.areas, 4 * pm.areas, rtol=1e-5)
    f = pm.flip("horizontal")
    np.testing.assert_allclose(f.to_ndarray().sum(),
                               pm.to_ndarray().sum(), rtol=0.05, atol=20)
    c = pm.crop(np.array([4, 4, 30, 30]))
    assert (c.height, c.width) == (26, 26)

    translated = pm.translate((40, 48), 4.0, "horizontal")
    for obj_t, obj in zip(translated.masks, pm.masks):
        for pt, p in zip(obj_t, obj):
            np.testing.assert_allclose(
                pt[0::2], np.clip(p[0::2] + 4.0, 0, 48))
            np.testing.assert_allclose(pt[1::2], p[1::2])


def test_polygon_rotate_matches_bitmap_rotate():
    """Coordinate rotate (-angle matrix) must land where the raster
    rotate puts the mass."""
    pm = PolygonMasks.random(num_masks=2, height=48, width=48,
                             rng=np.random.RandomState(3))
    angle = 90.0
    raster_then_rotate = BitmapMasks(
        pm.to_ndarray(), 48, 48).rotate((48, 48), angle)
    rotate_then_raster = pm.rotate((48, 48), angle).to_ndarray()
    inter = (raster_then_rotate.to_ndarray() & rotate_then_raster).sum()
    union = (raster_then_rotate.to_ndarray() | rotate_then_raster).sum()
    assert inter / union > 0.8


def test_polygon_crop_and_resize(pm):
    boxes = np.array([[4.0, 4.0, 36.0, 36.0]], np.float32)
    out = pm.crop_and_resize(boxes, (28, 28), np.array([1]))
    assert (out.height, out.width) == (28, 28)
    assert out.to_ndarray().shape == (1, 28, 28)
    with pytest.raises(ValueError):
        pm.crop_and_resize(boxes, (28, 28), np.array([0]),
                           binarize=False)


def test_polygon_shear_clips(pm):
    s = pm.shear((40, 48), 0.5, "horizontal")
    for obj in s.masks:
        for p in obj:
            assert (p[0::2] <= 48).all() and (p[0::2] >= 0).all()


def test_polygon_pad_and_expand(pm):
    p = pm.pad((60, 60))
    assert (p.height, p.width) == (60, 60)
    with pytest.raises(NotImplementedError):
        pm.expand(60, 60, 5, 5)
