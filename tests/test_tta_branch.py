"""TTA merge + 10-branch OneOf augmentation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_one_of_augment_all_branches_finite():
    from iif_tpu.data.branch_augment import one_of_augment, _branches

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 32, 32, 3), jnp.float32)
    out = one_of_augment(jax.random.PRNGKey(0), x)
    assert out.shape == x.shape

    key = jax.random.PRNGKey(1)
    for i, br in enumerate(_branches(key, x)):
        y = np.asarray(br((key, x)))
        assert np.isfinite(y).all(), i
        assert y.min() >= -1e-5 and y.max() <= 1.0 + 1e-5, i


def test_one_of_augment_jits():
    from iif_tpu.data.branch_augment import one_of_augment

    x = jnp.ones((2, 32, 32, 3)) * 0.5
    out = jax.jit(one_of_augment)(jax.random.PRNGKey(0), x)
    assert np.isfinite(np.asarray(out)).all()


def test_merge_aug_detections_flip_and_scale():
    from iif_tpu.detection.tta import merge_aug_detections, flip_boxes

    # one true object at [10, 10, 30, 30] in a 100x80 image (h=100, w=80)
    view0 = {"boxes": np.array([[20, 20, 60, 60]], np.float32),  # scale 2
             "scores": np.array([0.9], np.float32),
             "labels": np.array([3]), "valid": np.array([True])}
    # flipped view at scale 1: x' = w - x
    view1 = {"boxes": np.array([[80 - 30, 10, 80 - 10, 30]], np.float32),
             "scores": np.array([0.8], np.float32),
             "labels": np.array([3]), "valid": np.array([True])}
    merged = merge_aug_detections(
        [view0, view1],
        [{"scale_factor": 2.0, "flip": False},
         {"scale_factor": 1.0, "flip": True}],
        orig_shape=(100, 80), iou_thr=0.5)
    # both views map to the same box -> NMS keeps one
    assert len(merged["boxes"]) == 1
    np.testing.assert_allclose(merged["boxes"][0], [10, 10, 30, 30],
                               atol=1e-4)
    assert merged["scores"][0] == pytest.approx(0.9)


def test_merge_aug_detections_empty():
    from iif_tpu.detection.tta import merge_aug_detections

    out = merge_aug_detections(
        [{"boxes": np.zeros((2, 4)), "scores": np.zeros(2),
          "labels": np.zeros(2, np.int64), "valid": np.zeros(2, bool)}],
        [{"scale_factor": 1.0, "flip": False}], (50, 50))
    assert len(out["boxes"]) == 0


def test_multi_scale_flip_views():
    from iif_tpu.detection.tta import multi_scale_flip_views

    views = multi_scale_flip_views([(1333, 800), (1333, 640)], flip=True)
    assert len(views) == 4
    assert views[1]["flip"] and not views[0]["flip"]


# ---------------------------------------------------------------- aug-test
H = W = 128
NC = 6


@pytest.fixture(scope="module")
def tiny_detector():
    from iif_tpu.detection.detector import MaskRCNN

    model = MaskRCNN(num_classes=NC, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_maskrcnn_aug_test_shapes_and_flip_consistency(tiny_detector):
    """Reference aug-test semantics (test_mixins.py:138-176): merged
    proposals re-scored per view, averaged, one NMS. Identity+flip views
    of the same image must agree with the single-view result."""
    from iif_tpu.detection.detector import DetTestCfg
    from iif_tpu.detection.tta import maskrcnn_aug_test

    model, variables = tiny_detector
    cfg = DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32, max_per_img=10,
                     score_thr=0.0)
    img = jax.random.uniform(jax.random.PRNGKey(1), (H, W, 3))
    views = jnp.stack([img, img[:, ::-1, :]])           # identity + hflip
    sf = jnp.ones((2,))
    flips = jnp.asarray([False, True])
    content = jnp.asarray([[H, W], [H, W]], jnp.float32)

    out = jax.jit(lambda v, im: maskrcnn_aug_test(
        model, v, im, sf, flips, content,
        _iif_ones(), cfg))(variables, views)
    assert out["boxes"].shape == (10, 4)
    assert out["scores"].shape == (10,)
    assert out["masks"].shape == (10, 28, 28)
    b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    assert np.isfinite(b).all()
    assert (b[:, 2] >= b[:, 0] - 1e-3).all()
    assert (b[:, :4] >= -1e-3).all() and (b[:, 2] <= W + 1e-3).all()

    # single identity view ~ matches the two-view result's top box (the
    # flipped view sees the mirrored image -> same features mirrored)
    out1 = jax.jit(lambda v, im: maskrcnn_aug_test(
        model, v, im, sf[:1], flips[:1], content[:1],
        _iif_ones(), cfg))(variables, views[:1])
    v1 = np.asarray(out1["valid"]); v2 = np.asarray(out["valid"])
    assert v1.any() == v2.any()


def _iif_ones():
    from iif_tpu.detection.losses import DetIIFLoss

    return DetIIFLoss(weights=jnp.ones(NC + 1))


def test_aug_test_box_mapping_roundtrip():
    from iif_tpu.detection.tta import _boxes_from_view, _boxes_to_view

    boxes = jnp.asarray([[10., 20., 50., 60.], [0., 0., 30., 30.]])
    for flip in (False, True):
        v = _boxes_to_view(boxes, jnp.float32(2.0), jnp.asarray(flip),
                           jnp.float32(200.0))
        back = _boxes_from_view(v, jnp.float32(2.0), jnp.asarray(flip),
                                jnp.float32(200.0))
        np.testing.assert_allclose(np.asarray(back), np.asarray(boxes),
                                   atol=1e-5)


def test_cascade_aug_test_shapes():
    """cascade_roi_head aug_test semantics: 3 stages on the merged
    proposal set per view, averaged stage activations, stage-averaged
    masks with flip-back."""
    from iif_tpu.detection.cascade import CascadeMaskRCNN
    from iif_tpu.detection.detector import DetTestCfg
    from iif_tpu.detection.tta import cascade_aug_test

    model = CascadeMaskRCNN(num_classes=NC, depth=18, frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    cfg = DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32, max_per_img=10,
                     score_thr=0.0)
    img = jax.random.uniform(jax.random.PRNGKey(2), (H, W, 3))
    views = jnp.stack([img, img[:, ::-1, :]])
    sf = jnp.ones((2,))
    flips = jnp.asarray([False, True])
    content = jnp.asarray([[H, W], [H, W]], jnp.float32)
    losses = [_iif_ones()] * model.num_stages

    out = jax.jit(lambda v, im: cascade_aug_test(
        model, v, im, sf, flips, content, losses, cfg))(variables, views)
    assert out["boxes"].shape == (10, 4)
    assert out["masks"].shape == (10, 28, 28)
    b = np.asarray(out["boxes"])[np.asarray(out["valid"])]
    assert np.isfinite(b).all()
    assert (b >= -1e-3).all() and (b[:, 2] <= W + 1e-3).all() \
        and (b[:, 3] <= H + 1e-3).all()
