"""Differential geometry parity vs the lifted reference oracles
(VERDICT round-2 item 3): box coder, anchor grids, mask pasting,
RoIAlign sampling, and NMS, each checked against an independent
torch/numpy transcription of the reference semantics
(``tests/oracles/geometry_oracle.py``)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms, nms
from iif_tpu.ops.roi_align import roi_align
from iif_tpu.detection.mask_head import paste_masks
from iif_tpu.detection.roi_extractor import SingleRoIExtractor

from tests.oracles.geometry_oracle import (
    AnchorOracle,
    bbox2delta_t,
    delta2bbox_t,
    do_paste_mask_t,
    nms_np,
    roi_align_np,
)

RNG = np.random.RandomState(42)


def _rand_boxes(rng, n, img_w=320.0, img_h=256.0, min_size=2.0):
    x1 = rng.uniform(0, img_w - min_size - 1, n)
    y1 = rng.uniform(0, img_h - min_size - 1, n)
    w = rng.uniform(min_size, img_w / 2, n)
    h = rng.uniform(min_size, img_h / 2, n)
    return np.stack([x1, y1, np.minimum(x1 + w, img_w),
                     np.minimum(y1 + h, img_h)], -1).astype(np.float32)


# ---------------------------------------------------------------- box coder
def test_bbox2delta_parity():
    props = _rand_boxes(RNG, 64)
    gts = _rand_boxes(RNG, 64)
    for means, stds in [((0, 0, 0, 0), (1, 1, 1, 1)),
                        ((0, 0, 0, 0), (0.1, 0.1, 0.2, 0.2)),
                        ((0.1, -0.1, 0.05, 0.0), (0.3, 0.3, 0.5, 0.5))]:
        ref = bbox2delta_t(torch.tensor(props), torch.tensor(gts),
                           means, stds).numpy()
        ours = np.asarray(bbox2delta(jnp.asarray(props), jnp.asarray(gts),
                                     means, stds))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_classes", [1, 5])
@pytest.mark.parametrize("max_shape", [None, (256, 320)])
def test_delta2bbox_parity(num_classes, max_shape):
    rois = _rand_boxes(RNG, 48)
    # wide delta range so the wh-ratio clip branch is exercised
    deltas = RNG.randn(48, num_classes * 4).astype(np.float32) * 2.5
    means, stds = (0., 0., 0., 0.), (0.1, 0.1, 0.2, 0.2)
    ref = delta2bbox_t(torch.tensor(rois), torch.tensor(deltas),
                       means, stds, max_shape=max_shape).numpy()
    ours = np.asarray(delta2bbox(jnp.asarray(rois), jnp.asarray(deltas),
                                 means, stds, max_shape=max_shape))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-3)


def test_delta2bbox_identity_delta_recovers_roi():
    rois = _rand_boxes(RNG, 8)
    zero = np.zeros((8, 4), np.float32)
    ref = delta2bbox_t(torch.tensor(rois), torch.tensor(zero)).numpy()
    np.testing.assert_allclose(ref, rois, atol=1e-5)
    ours = np.asarray(delta2bbox(jnp.asarray(rois), jnp.asarray(zero)))
    np.testing.assert_allclose(ours, rois, atol=1e-5)


# ------------------------------------------------------------------ anchors
RPN_STRIDES = [4, 8, 16, 32, 64]


def test_base_anchor_parity():
    gen = AnchorGenerator(strides=RPN_STRIDES, ratios=[0.5, 1.0, 2.0],
                          scales=[8.0])
    oracle = AnchorOracle(RPN_STRIDES)
    for ours, ref in zip(gen.base_anchors, oracle.base_anchors):
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                                   rtol=1e-6, atol=1e-4)


@pytest.mark.parametrize("img_hw", [(800, 1344), (123, 217), (64, 64)])
def test_anchor_grid_parity(img_hw):
    h, w = img_hw
    sizes = [(-(-h // s), -(-w // s)) for s in RPN_STRIDES]
    gen = AnchorGenerator(strides=RPN_STRIDES, ratios=[0.5, 1.0, 2.0],
                          scales=[8.0])
    oracle = AnchorOracle(RPN_STRIDES)
    ours_lvls = gen.grid_anchors(sizes)
    ref_lvls = oracle.grid_anchors(sizes)
    for ours, ref in zip(ours_lvls, ref_lvls):
        assert ours.shape == tuple(ref.shape)
        np.testing.assert_allclose(ours, ref.numpy(), rtol=1e-6, atol=1e-3)


@pytest.mark.parametrize("pad_hw", [(800, 1344), (790, 1330), (100, 100)])
def test_anchor_valid_flags_parity(pad_hw):
    sizes = [(200, 336), (100, 168), (50, 84), (25, 42), (13, 21)]
    gen = AnchorGenerator(strides=RPN_STRIDES, ratios=[0.5, 1.0, 2.0],
                          scales=[8.0])
    oracle = AnchorOracle(RPN_STRIDES)
    ours_lvls = gen.valid_flags(sizes, pad_hw)
    ref_lvls = oracle.valid_flags(sizes, pad_hw)
    for ours, ref in zip(ours_lvls, ref_lvls):
        np.testing.assert_array_equal(np.asarray(ours, bool), ref.numpy())


# --------------------------------------------------------------- mask paste
def test_paste_masks_parity():
    rng = np.random.RandomState(7)
    n, s, img_h, img_w = 6, 28, 96, 128
    probs = rng.uniform(0, 1, (n, s, s)).astype(np.float32)
    boxes = _rand_boxes(rng, n, img_w, img_h, min_size=8.0)

    ref = do_paste_mask_t(torch.tensor(probs)[:, None],
                          torch.tensor(boxes), img_h, img_w).numpy()
    ours_bool = np.asarray(paste_masks(jnp.asarray(probs),
                                       jnp.asarray(boxes),
                                       (img_h, img_w), threshold=0.5))
    # binarized parity wherever the float value is not razor-thin at the
    # threshold (resize kernels differ in ulp-level rounding only)
    confident = np.abs(ref - 0.5) > 1e-3
    np.testing.assert_array_equal(ours_bool[confident],
                                  (ref >= 0.5)[confident])
    assert confident.mean() > 0.99


def test_paste_masks_float_parity():
    """Pre-threshold float parity on the interior (the half-pixel border
    is zero-padded by both, but with different kernel supports)."""
    rng = np.random.RandomState(8)
    n, s, img_h, img_w = 4, 28, 80, 80
    probs = rng.uniform(0, 1, (n, s, s)).astype(np.float32)
    # boxes well inside the image so no taps touch the canvas border
    boxes = np.stack([rng.uniform(8, 20, n), rng.uniform(8, 20, n),
                      rng.uniform(50, 70, n), rng.uniform(50, 70, n)],
                     -1).astype(np.float32)
    ref = do_paste_mask_t(torch.tensor(probs)[:, None],
                          torch.tensor(boxes), img_h, img_w).numpy()
    import jax

    def _paste_float(m, box):
        x1, y1, x2, y2 = box
        scale = jnp.stack([(y2 - y1) / s, (x2 - x1) / s])
        out = jax.image.scale_and_translate(
            m[..., None], (img_h, img_w, 1), (0, 1), scale,
            jnp.stack([y1, x1]), method="bilinear",
            antialias=False)[..., 0]
        return out

    ours = np.asarray(jax.vmap(_paste_float)(jnp.asarray(probs),
                                             jnp.asarray(boxes)))
    # compare strictly inside every box (1px margin from the bilinear
    # support at the box edge, where zero-padding conventions differ)
    for i in range(n):
        x1, y1, x2, y2 = boxes[i]
        sl = np.s_[int(np.ceil(y1)) + 1:int(np.floor(y2)) - 1,
                   int(np.ceil(x1)) + 1:int(np.floor(x2)) - 1]
        np.testing.assert_allclose(ours[i][sl], ref[i][sl],
                                   rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------- roi align
def test_roi_align_parity_vs_mmcv_semantics():
    rng = np.random.RandomState(3)
    feat = rng.randn(2, 24, 32, 8).astype(np.float32)
    rois = np.concatenate(
        [rng.randint(0, 2, (10, 1)).astype(np.float32),
         _rand_boxes(rng, 10, img_w=32 * 4.0, img_h=24 * 4.0)], 1)
    ref = roi_align_np(feat, rois, spatial_scale=0.25, out_size=7,
                       sampling_ratio=2, aligned=True)
    ours = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(rois),
                                (7, 7), spatial_scale=0.25,
                                sampling_ratio=2, aligned=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_roi_extractor_parity_vs_oracle():
    """Multi-level flat-gather extractor == per-level oracle RoIAlign at
    the mmdet level-assignment rule (floor(log2(sqrt(area)/56)))."""
    rng = np.random.RandomState(4)
    b, c = 2, 8
    strides = (4, 8, 16, 32)
    img_h, img_w = 128, 160
    feats = [rng.randn(b, img_h // s, img_w // s, c).astype(np.float32)
             for s in strides]
    # mix of small and large rois to hit several levels
    sizes = np.array([10, 30, 80, 150, 60, 20, 120, 40], np.float32)
    x1 = rng.uniform(0, img_w - 1 - sizes.clip(max=img_w - 2))
    y1 = rng.uniform(0, img_h - 1 - sizes.clip(max=img_h - 2))
    boxes = np.stack([x1, y1, np.minimum(x1 + sizes, img_w),
                      np.minimum(y1 + sizes, img_h)], -1).astype(np.float32)
    bi = rng.randint(0, b, len(sizes)).astype(np.float32)
    rois = np.concatenate([bi[:, None], boxes], 1)

    ext = SingleRoIExtractor((7, 7), featmap_strides=strides)
    ours = np.asarray(ext([jnp.asarray(f) for f in feats],
                          jnp.asarray(rois)))

    scale = np.sqrt((rois[:, 3] - rois[:, 1]) * (rois[:, 4] - rois[:, 2]))
    lvls = np.clip(np.floor(np.log2(scale / 56.0 + 1e-6)), 0, 3).astype(int)
    for i in range(len(rois)):
        ref = roi_align_np(feats[lvls[i]], rois[i:i + 1],
                           spatial_scale=1.0 / strides[lvls[i]],
                           out_size=7, sampling_ratio=2, aligned=True)
        np.testing.assert_allclose(ours[i], ref[0], rtol=1e-4, atol=1e-4,
                                   err_msg=f"roi {i} level {lvls[i]}")


# ---------------------------------------------------------------------- nms
def test_nms_parity_vs_oracle():
    rng = np.random.RandomState(5)
    boxes = _rand_boxes(rng, 200)
    scores = rng.uniform(0.01, 1.0, 200).astype(np.float32)
    for thr in (0.3, 0.5, 0.7):
        ref_keep = set(nms_np(boxes, scores, thr).tolist())
        keep, order = nms(jnp.asarray(boxes), jnp.asarray(scores), thr)
        ours_keep = set(np.asarray(order)[np.asarray(keep)].tolist())
        assert ours_keep == ref_keep, f"iou_thr={thr}"


def test_multiclass_nms_parity_vs_oracle():
    """multiclass_nms == score_thr filter + per-class greedy NMS + global
    top-k, composed from the independent numpy oracle."""
    rng = np.random.RandomState(6)
    n, nc = 60, 4
    boxes = np.tile(_rand_boxes(rng, n)[:, None, :], (1, nc, 1))
    boxes += rng.uniform(-2, 2, boxes.shape).astype(np.float32)
    boxes = boxes.clip(0, 320).astype(np.float32)
    scores = rng.uniform(0, 1, (n, nc + 1)).astype(np.float32)
    score_thr, iou_thr, max_out = 0.4, 0.5, 20

    # oracle: flatten, filter, per-class NMS via coordinate offset trick
    flat_boxes = boxes.reshape(-1, 4)
    flat_scores = scores[:, :nc].reshape(-1)
    flat_labels = np.tile(np.arange(nc), n)
    m = flat_scores > score_thr
    fb, fs, fl = flat_boxes[m], flat_scores[m], flat_labels[m]
    off = fb + fl[:, None] * (flat_boxes.max() + 1)
    kept = nms_np(off, fs, iou_thr)
    kept = kept[np.argsort(-fs[kept], kind="stable")][:max_out]
    ref = sorted(zip(fs[kept].round(5).tolist(), fl[kept].tolist()))

    dets, out_scores, out_labels, valid = multiclass_nms(
        jnp.asarray(boxes.reshape(n, -1)), jnp.asarray(scores),
        score_thr=score_thr, iou_threshold=iou_thr, max_per_img=max_out)
    v = np.asarray(valid)
    ours = sorted(zip(np.asarray(out_scores)[v].round(5).tolist(),
                      np.asarray(out_labels)[v].tolist()))
    assert ours == ref


# ------------------------------------------------- legacy (MMDet V1.x) coder
def test_legacy_coder_parity():
    from iif_tpu.ops.boxes import legacy_bbox2delta, legacy_delta2bbox
    from tests.oracles.geometry_oracle import (legacy_bbox2delta_t,
                                               legacy_delta2bbox_t)

    rng = np.random.RandomState(7)
    props = _rand_boxes(rng, 48)
    gts = _rand_boxes(rng, 48)
    means, stds = (0.0, 0.0, 0.1, 0.05), (0.1, 0.1, 0.2, 0.2)
    ours = np.asarray(legacy_bbox2delta(jnp.asarray(props), jnp.asarray(gts),
                                        means, stds))
    want = legacy_bbox2delta_t(torch.from_numpy(props),
                               torch.from_numpy(gts), means, stds).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-5)

    deltas = rng.randn(48, 8).astype(np.float32)
    ours = np.asarray(legacy_delta2bbox(
        jnp.asarray(props), jnp.asarray(deltas), means, stds,
        max_shape=(256, 320)))
    want = legacy_delta2bbox_t(torch.from_numpy(props),
                               torch.from_numpy(deltas), means, stds,
                               max_shape=(256, 320)).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-5, atol=1e-4)


def test_legacy_delta2bbox_reference_golden():
    """The reference's own docstring example
    (legacy_delta_xywh_bbox_coder.py:139-215)."""
    from iif_tpu.ops.boxes import legacy_delta2bbox

    rois = jnp.asarray([[0., 0., 1., 1.], [0., 0., 1., 1.],
                        [0., 0., 1., 1.], [5., 5., 5., 5.]])
    deltas = jnp.asarray([[0., 0., 0., 0.], [1., 1., 1., 1.],
                          [0., 0., 2., -1.], [0.7, -1.9, -0.5, 0.3]])
    got = np.asarray(legacy_delta2bbox(rois, deltas, max_shape=(32, 32)))
    want = np.array([[0.0000, 0.0000, 1.5000, 1.5000],
                     [0.0000, 0.0000, 5.2183, 5.2183],
                     [0.0000, 0.1321, 7.8891, 0.8679],
                     [5.3967, 2.4251, 6.0033, 3.7749]])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_legacy_anchor_parity():
    from iif_tpu.ops.anchors import LegacyAnchorGenerator
    from tests.oracles.geometry_oracle import LegacyAnchorOracle

    gen = LegacyAnchorGenerator(strides=RPN_STRIDES, ratios=[0.5, 1.0, 2.0],
                                scales=[8.0])
    oracle = LegacyAnchorOracle(RPN_STRIDES)
    for ours, ref in zip(gen.base_anchors, oracle.gen_base_anchors()):
        np.testing.assert_allclose(ours, ref.numpy(), atol=1e-4)
