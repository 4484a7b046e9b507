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
