"""OHEM / instance-balanced / IoU-balanced / score-HLR sampler family:
oracle parity on the deterministic rules, statistical properties on the
random ones, and end-to-end wiring through ``maskrcnn_loss``."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.ops.samplers_extra import (
    instance_balanced_pos_priority,
    iou_balanced_neg_priority,
    nms_match_leaders,
    sample_pos_neg,
    score_hlr_neg_priority,
)
from tests.oracles.sampler_oracle import (
    nms_match_groups,
    ohem_topk,
    score_hlr_oracle,
)


def _random_boxes(rng, n, size=200):
    x1 = rng.uniform(0, size - 20, n)
    y1 = rng.uniform(0, size - 20, n)
    w = rng.uniform(8, 60, n)
    h = rng.uniform(8, 60, n)
    return np.stack([x1, y1, np.minimum(x1 + w, size),
                     np.minimum(y1 + h, size)], axis=1).astype(np.float32)


# ------------------------------------------------------------------- OHEM
@pytest.mark.parametrize("seed", range(5))
def test_ohem_matches_topk_loss_oracle(seed):
    rng = np.random.RandomState(seed)
    n = 64
    assigned = rng.choice([0, 0, 0, 1, 2, 3], n).astype(np.int32)
    pos_loss = rng.rand(n).astype(np.float32)
    neg_loss = rng.rand(n).astype(np.float32)

    inds, is_pos, valid, _ = sample_pos_neg(
        jax.random.PRNGKey(seed), jnp.asarray(assigned), num=16,
        pos_fraction=0.25, pos_sampler="ohem", neg_sampler="ohem",
        pos_loss=jnp.asarray(pos_loss), neg_loss=jnp.asarray(neg_loss))
    inds, is_pos, valid = map(np.asarray, (inds, is_pos, valid))

    got_pos = set(inds[is_pos & valid].tolist())
    got_neg = set(inds[~is_pos & valid].tolist())
    want_pos = ohem_topk(pos_loss, assigned > 0, 4)
    # negatives fill every slot positives left empty
    want_neg = ohem_topk(neg_loss, assigned == 0, 16 - len(want_pos))
    assert got_pos == want_pos
    assert got_neg == want_neg


# ------------------------------------------------- instance-balanced pos
def test_instance_balanced_quota():
    rng = np.random.RandomState(0)
    # gt 1 owns 30 positives, gts 2/3 own 5 each; expect per-gt quota
    assigned = np.zeros(100, np.int32)
    assigned[:30] = 1
    assigned[30:35] = 2
    assigned[35:40] = 3
    k = 12   # num_per_gt = round(12/3)+1 = 5
    pri = instance_balanced_pos_priority(
        jax.random.PRNGKey(1), jnp.asarray(assigned), k)
    idx = np.asarray(jnp.argsort(-jnp.where(assigned > 0, pri, -jnp.inf)))
    chosen = idx[:k]
    counts = np.bincount(assigned[chosen], minlength=4)
    # every pick is a positive and no gt exceeds its quota (the reference
    # also random-subsamples the pooled in-quota picks when they exceed k,
    # instance_balanced_pos_sampler.py:54-57)
    assert (assigned[chosen] > 0).all()
    assert counts[1] <= 5 and counts[2] <= 5 and counts[3] <= 5
    assert counts[1] + counts[2] + counts[3] == k


def test_instance_balanced_all_pos_when_scarce():
    assigned = np.zeros(50, np.int32)
    assigned[[3, 17, 41]] = [1, 2, 2]
    inds, is_pos, valid, _ = sample_pos_neg(
        jax.random.PRNGKey(0), jnp.asarray(assigned), num=16,
        pos_fraction=0.5, pos_sampler="instance_balanced")
    sel = set(np.asarray(inds)[np.asarray(is_pos) & np.asarray(valid)]
              .tolist())
    assert sel == {3, 17, 41}


# ------------------------------------------------- IoU-balanced negatives
@pytest.mark.parametrize("seed", range(3))
def test_iou_balanced_bins(seed):
    rng = np.random.RandomState(seed)
    n = 600
    assigned = np.zeros(n, np.int32)
    overlaps = rng.uniform(0.0, 0.5, n).astype(np.float32)
    num_expected = 90
    pri = iou_balanced_neg_priority(
        jax.random.PRNGKey(seed), jnp.asarray(assigned),
        jnp.asarray(overlaps), num_expected,
        floor_thr=-1.0, floor_fraction=0.0, num_bins=3)
    idx = np.asarray(jnp.argsort(-pri))[:num_expected]
    max_iou = overlaps.max()
    interval = max_iou / 3
    bins = np.clip((overlaps[idx] / interval).astype(int), 0, 2)
    counts = np.bincount(bins, minlength=3)
    # abundant candidates in every bin -> exactly per_num each
    assert (counts == 30).all(), counts


def test_iou_balanced_floor_fraction():
    rng = np.random.RandomState(1)
    n = 400
    assigned = np.zeros(n, np.int32)
    overlaps = np.concatenate([np.zeros(200),
                               rng.uniform(0.1, 0.5, 200)]).astype(
        np.float32)
    num_expected = 100
    pri = iou_balanced_neg_priority(
        jax.random.PRNGKey(2), jnp.asarray(assigned),
        jnp.asarray(overlaps), num_expected,
        floor_thr=0.05, floor_fraction=0.5, num_bins=2)
    idx = np.asarray(jnp.argsort(-pri))[:num_expected]
    n_iou = (overlaps[idx] >= 0.05).sum()
    assert n_iou == 50   # (1 - floor_fraction) * 100, bins 2x25
    assert (overlaps[idx] < 0.05).sum() == 50


# ----------------------------------------------------------- NMS-Match
@pytest.mark.parametrize("seed", range(5))
def test_nms_match_leaders_oracle(seed):
    rng = np.random.RandomState(seed)
    n = 40
    boxes = _random_boxes(rng, n, size=100)
    scores = rng.rand(n).astype(np.float32)
    kept, leader = nms_match_leaders(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.ones(n, bool), 0.3)
    kept, leader = np.asarray(kept), np.asarray(leader)

    groups = nms_match_groups(
        np.concatenate([boxes, scores[:, None]], axis=1), 0.3)
    want_leader = np.empty(n, int)
    want_kept = np.zeros(n, bool)
    for g in groups:
        want_kept[g[0]] = True
        want_leader[g] = g[0]
    assert (kept == want_kept).all()
    assert (leader == want_leader).all()


# ------------------------------------------------------------ score-HLR
@pytest.mark.parametrize("seed", range(5))
def test_score_hlr_oracle_parity(seed):
    rng = np.random.RandomState(seed)
    n = 80
    assigned = np.zeros(n, np.int32)
    assigned[rng.choice(n, 10, replace=False)] = 1   # a few positives
    neg = assigned == 0
    max_score = rng.uniform(0.1, 0.9, n).astype(np.float32)  # all valid
    decoded = _random_boxes(rng, n)
    neg_loss = rng.rand(n).astype(np.float32)
    num_expected = 24

    res = score_hlr_neg_priority(
        jax.random.PRNGKey(seed), jnp.asarray(assigned),
        jnp.asarray(max_score), jnp.asarray(decoded),
        jnp.asarray(neg_loss), num_expected)
    pri = np.asarray(res.priority)
    weights = np.asarray(res.weights)

    sel = np.argsort(-np.where(neg, pri, -np.inf),
                     kind="stable")[:num_expected]
    want_idx, want_w = score_hlr_oracle(
        max_score, decoded, neg, neg_loss, num_expected)
    assert set(sel.tolist()) == set(want_idx.tolist())
    got = {int(i): float(weights[i]) for i in sel}
    want = {int(i): float(w) for i, w in zip(want_idx, want_w)}
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-4), i


# ------------------------------------------------------------- e2e wiring
@pytest.mark.parametrize("pos_s,neg_s", [
    ("ohem", "ohem"),
    ("instance_balanced", "iou_balanced"),
    ("random", "score_hlr"),
])
def test_maskrcnn_loss_with_sampler(pos_s, neg_s):
    from iif_tpu.detection import MaskRCNN
    from iif_tpu.detection.detector import DetTrainCfg, maskrcnn_loss
    from iif_tpu.detection.losses import DetCrossEntropyLoss
    from tests.test_detection import NUM_CLASSES, _demo_inputs

    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, with_mask=False,
                     frozen_stages=-1)
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=32, num_mask_rois=4,
                      rcnn_pos_sampler=pos_s, rcnn_neg_sampler=neg_s,
                      rcnn_sampler_cfg=(("floor_thr", 0.0),))
    loss_cls = DetCrossEntropyLoss(num_classes=NUM_CLASSES)
    total, losses, aux = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(1), loss_cls, cfg)
    assert np.isfinite(float(total))
    grads = jax.grad(
        lambda p: maskrcnn_loss(
            model, {"params": p,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(1), loss_cls, cfg)[0])(
        variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
