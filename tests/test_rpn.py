"""RPN semantics: loss targets and proposal generation on crafted inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.rpn import RPNHead, rpn_loss, rpn_proposals
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.boxes import bbox2delta


def _level_setup(fh=8, fw=8, stride=8):
    gen = AnchorGenerator(strides=[stride], ratios=[1.0], scales=[4.0])
    anchors = gen.grid_anchors([(fh, fw)])[0]  # (fh*fw, 4), 32x32 anchors
    return gen, anchors


def test_rpn_head_shapes():
    head = RPNHead(num_anchors=3)
    feats = [jnp.zeros((2, 16, 16, 32)), jnp.zeros((2, 8, 8, 32))]
    v = head.init(jax.random.PRNGKey(0), feats)
    cls, reg = head.apply(v, feats)
    assert cls[0].shape == (2, 16, 16, 3)
    assert reg[1].shape == (2, 8, 8, 12)


def test_rpn_proposals_pick_high_score_anchor():
    _, anchors = _level_setup()
    n = anchors.shape[0]
    # objectness: anchor 10 wins; zero deltas -> proposal == anchor 10
    scores = np.full((1, 8, 8, 1), -10.0, np.float32)
    scores.reshape(1, -1)[0, 10] = 5.0
    deltas = np.zeros((1, 8, 8, 4), np.float32)
    props, pscores, valid = rpn_proposals(
        [jnp.asarray(scores)], [jnp.asarray(deltas)], [jnp.asarray(anchors)],
        (64, 64), nms_pre=16, max_per_img=4, nms_iou=0.7)
    assert valid[0, 0]
    top = np.asarray(props[0, 0])
    want = np.clip(anchors[10], 0, 64)
    np.testing.assert_allclose(top, want, atol=1e-4)
    # the proposal scores are sorted descending
    ps = np.asarray(pscores[0])[np.asarray(valid[0])]
    assert (np.diff(ps) <= 1e-6).all()


def test_rpn_proposals_clip_to_image():
    _, anchors = _level_setup()
    scores = np.zeros((1, 8, 8, 1), np.float32)
    deltas = np.zeros((1, 8, 8, 4), np.float32)
    props, _, valid = rpn_proposals(
        [jnp.asarray(scores)], [jnp.asarray(deltas)], [jnp.asarray(anchors)],
        (40, 48), nms_pre=64, max_per_img=64, nms_iou=0.7)
    p = np.asarray(props[0])[np.asarray(valid[0])]
    assert p[:, 0::2].max() <= 48 and p[:, 1::2].max() <= 40
    assert p.min() >= 0


def test_rpn_loss_perfect_predictions_near_zero_bbox_loss():
    _, anchors = _level_setup()
    gt = np.array([[[16, 16, 48, 48]]], np.float32)  # matches some anchors
    gt_valid = np.ones((1, 1), bool)
    # perfect deltas: encode gt wrt every anchor
    tgt = bbox2delta(jnp.asarray(anchors), jnp.broadcast_to(
        jnp.asarray(gt[0, 0]), anchors.shape))
    deltas = np.asarray(tgt).reshape(1, 8, 8, 4)
    # strong positive scores everywhere -> cls loss dominated by negatives
    scores = np.full((1, 8, 8, 1), 0.0, np.float32)
    lc, lb = rpn_loss(
        [jnp.asarray(scores)], [jnp.asarray(deltas)], jnp.asarray(anchors),
        jnp.ones(anchors.shape[0], bool), jnp.asarray(gt),
        jnp.asarray(gt_valid), jax.random.PRNGKey(0), num_samples=32)
    assert float(lb) < 1e-5     # regression targets met exactly
    assert np.isfinite(float(lc))


def test_rpn_loss_ignores_padded_gt():
    _, anchors = _level_setup()
    gt = np.array([[[16, 16, 48, 48], [0, 0, 64, 64]]], np.float32)
    lc1, lb1 = rpn_loss(
        [jnp.zeros((1, 8, 8, 1))], [jnp.zeros((1, 8, 8, 4))],
        jnp.asarray(anchors), jnp.ones(anchors.shape[0], bool),
        jnp.asarray(gt), jnp.asarray([[True, False]]),
        jax.random.PRNGKey(0), num_samples=32)
    lc2, lb2 = rpn_loss(
        [jnp.zeros((1, 8, 8, 1))], [jnp.zeros((1, 8, 8, 4))],
        jnp.asarray(anchors), jnp.ones(anchors.shape[0], bool),
        jnp.asarray(gt[:, :1]), jnp.asarray([[True]]),
        jax.random.PRNGKey(0), num_samples=32)
    # padded gt must not change the targets
    assert float(lb1) == pytest.approx(float(lb2), rel=1e-5)
