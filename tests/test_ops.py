"""Detection op tests: IoU, delta coder round-trip, NMS, RoIAlign,
anchors, assigner, sampler."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.ops import (
    AnchorGenerator,
    batched_nms,
    bbox2delta,
    bbox_overlaps,
    delta2bbox,
    max_iou_assign,
    multiclass_nms,
    nms,
    random_sample_pos_neg,
    roi_align,
)


def test_bbox_overlaps_known_values():
    a = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [10, 10, 20, 20]], jnp.float32)
    iou = np.asarray(bbox_overlaps(a, b))
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[0, 1] == pytest.approx(0.0)
    # [5,5,15,15] vs [0,0,10,10]: inter 25, union 175
    assert iou[1, 0] == pytest.approx(25 / 175, rel=1e-5)


def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    proposals = np.abs(rng.rand(20, 2) * 50)
    proposals = np.concatenate([proposals, proposals + 5 + rng.rand(20, 2) * 60],
                               axis=1).astype(np.float32)
    gt = proposals + rng.randn(20, 4).astype(np.float32) * 2
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 1)
    means, stds = (0.0, 0.0, 0.0, 0.0), (0.1, 0.1, 0.2, 0.2)
    deltas = bbox2delta(jnp.asarray(proposals), jnp.asarray(gt), means, stds)
    back = delta2bbox(jnp.asarray(proposals), deltas, means, stds)
    np.testing.assert_allclose(np.asarray(back), gt, atol=1e-3)


def test_delta2bbox_clamps_to_max_shape():
    rois = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    deltas = jnp.asarray([[5.0, 5.0, 2.0, 2.0]])
    out = np.asarray(delta2bbox(rois, deltas, max_shape=(20, 30)))
    assert out[:, 0::2].max() <= 30
    assert out[:, 1::2].max() <= 20


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([
        [0, 0, 10, 10],
        [1, 1, 11, 11],    # high overlap with first
        [20, 20, 30, 30],  # disjoint
    ], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, order = nms(boxes, scores, iou_threshold=0.5)
    keep = np.asarray(keep)
    order = np.asarray(order)
    kept_orig = set(order[keep].tolist())
    assert kept_orig == {0, 2}


def test_batched_nms_keeps_cross_class_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    idxs = jnp.asarray([0, 1])
    keep, order = batched_nms(boxes, scores, idxs, iou_threshold=0.5)
    assert np.asarray(keep).sum() == 2  # different classes -> both survive


def test_multiclass_nms_shapes_and_threshold():
    n, c = 30, 4
    rng = np.random.RandomState(0)
    xy = rng.rand(n, 2) * 50
    boxes = np.concatenate([xy, xy + 10], 1).astype(np.float32)
    scores = rng.rand(n, c + 1).astype(np.float32) * 0.5
    scores[0, 1] = 0.99
    dets, out_scores, labels, valid = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), score_thr=0.6,
        max_per_img=10)
    assert dets.shape == (10, 4)
    v = np.asarray(valid)
    assert v.sum() == 1
    assert np.asarray(labels)[0] == 1
    assert np.asarray(out_scores)[0] == pytest.approx(0.99, abs=1e-5)


def test_roi_align_constant_map():
    feat = jnp.ones((1, 16, 16, 3))
    rois = jnp.asarray([[0, 2, 2, 10, 10]], jnp.float32)
    out = roi_align(feat, rois, output_size=(7, 7))
    assert out.shape == (1, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_roi_align_linear_map_exact():
    """Bilinear sampling of a linear ramp is exact: value == x coordinate."""
    h = w = 16
    xx = np.arange(w, dtype=np.float32)[None, :].repeat(h, 0)
    feat = jnp.asarray(xx[None, :, :, None])
    rois = jnp.asarray([[0, 4, 4, 12, 12]], jnp.float32)
    out_w = 4
    out = np.asarray(roi_align(feat, rois, output_size=(out_w, out_w),
                               sampling_ratio=2, aligned=True))[0, :, :, 0]
    bin_w = 8.0 / out_w
    expected_cols = 4 - 0.5 + (np.arange(out_w) + 0.5) * bin_w
    np.testing.assert_allclose(out[0], expected_cols, atol=1e-4)


def test_roi_align_gradients_flow():
    feat = jnp.ones((1, 8, 8, 2))
    rois = jnp.asarray([[0, 1, 1, 6, 6]], jnp.float32)

    def f(x):
        return roi_align(x, rois, output_size=(2, 2)).sum()

    g = jax.grad(f)(feat)
    assert float(jnp.abs(g).sum()) > 0


def test_anchor_generator_counts_and_values():
    gen = AnchorGenerator(strides=[4], ratios=[1.0], scales=[8.0])
    anchors = gen.grid_anchors([(2, 2)])[0]
    assert anchors.shape == (4, 4)
    # first anchor: centered at (0,0) with size 32 (4 * 8)
    np.testing.assert_allclose(anchors[0], [-16, -16, 16, 16])
    # second anchor shifted by stride in x
    np.testing.assert_allclose(anchors[1], [-12, -16, 20, 16])


def test_anchor_generator_ratios():
    gen = AnchorGenerator(strides=[16], ratios=[0.5, 1.0, 2.0], scales=[8.0])
    a = gen.base_anchors[0]
    assert a.shape == (3, 4)
    ws = a[:, 2] - a[:, 0]
    hs = a[:, 3] - a[:, 1]
    np.testing.assert_allclose(hs / ws, [0.5, 1.0, 2.0], rtol=1e-5)
    np.testing.assert_allclose(ws * hs, [128 ** 2] * 3, rtol=1e-5)


def test_max_iou_assign_basic():
    boxes = jnp.asarray([
        [0, 0, 10, 10],      # iou 1.0 with gt0 -> pos
        [0, 0, 5, 5],        # iou 0.25 with gt0 -> neg
        [6, 6, 10, 10],      # low iou -> neg
        [100, 100, 110, 110],  # iou 1.0 with padded gt -> must stay neg
    ], jnp.float32)
    gts = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    gt_valid = jnp.asarray([True, False])
    assigned, overlaps = max_iou_assign(boxes, gts, gt_valid,
                                        pos_iou_thr=0.5, neg_iou_thr=0.4)
    a = np.asarray(assigned)
    assert a[0] == 1      # matched gt 0
    assert a[1] == 0 and a[2] == 0
    assert a[3] == 0      # padded gt ignored


def test_max_iou_assign_low_quality_match():
    # gt whose best box is below pos_iou_thr still claims it
    boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gts = jnp.asarray([[0, 0, 22, 10]], jnp.float32)  # iou ~0.45
    assigned, _ = max_iou_assign(boxes, gts, jnp.asarray([True]),
                                 pos_iou_thr=0.5, neg_iou_thr=0.3,
                                 min_pos_iou=0.3)
    assert int(assigned[0]) == 1


def test_random_sampler_fixed_shapes():
    key = jax.random.PRNGKey(0)
    assigned = jnp.asarray([0] * 100 + [1] * 5 + [2] * 3 + [-1] * 10)
    inds, is_pos, valid = random_sample_pos_neg(key, assigned, num=32,
                                                pos_fraction=0.25)
    assert inds.shape == (32,)
    a = np.asarray(assigned)[np.asarray(inds)]
    pos = np.asarray(is_pos)
    v = np.asarray(valid)
    assert (a[pos & v] > 0).all()
    assert (a[~pos & v] == 0).all()
    assert pos.sum() == 8  # all 8 positives available


def test_random_sampler_scarce_positives():
    key = jax.random.PRNGKey(1)
    assigned = jnp.asarray([0] * 60 + [1] * 2)  # only 2 positives
    inds, is_pos, valid = random_sample_pos_neg(key, assigned, num=16,
                                                pos_fraction=0.5)
    a = np.asarray(assigned)[np.asarray(inds)]
    pos = np.asarray(is_pos)
    assert pos.sum() == 2
    assert (a[pos] > 0).all()
    assert np.asarray(valid).sum() == 16  # backfilled with negatives
