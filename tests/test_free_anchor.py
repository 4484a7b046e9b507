"""FreeAnchor: bag-loss parity vs the lifted torch oracle + a learning
smoke test through the single-stage trainer."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from iif_tpu.detection.free_anchor import (
    FreeAnchor,
    free_anchor_image_loss,
    negative_bag_loss,
)
from tests.oracles.dense_head_oracle import free_anchor_losses_t

C = 5
K = 8


def _case(seed, n_anchors=64, n_gt=3):
    rng = np.random.default_rng(seed)
    # large, jittered gt boxes so every anchor-gt IoU is positive and
    # distinct (torch.topk vs lax.top_k break exact ties differently)
    ctr = rng.uniform(40, 60, (n_anchors, 2))
    wh = rng.uniform(30, 90, (n_anchors, 2))
    anchors = np.concatenate([ctr - wh / 2, ctr + wh / 2], 1)
    gctr = rng.uniform(35, 65, (n_gt, 2))
    gwh = rng.uniform(40, 80, (n_gt, 2))
    gts = np.concatenate([gctr - gwh / 2, gctr + gwh / 2], 1)
    labels = rng.integers(0, C, n_gt)
    scores = rng.normal(size=(n_anchors, C)).astype(np.float32)
    deltas = (rng.normal(size=(n_anchors, 4)) * 0.3).astype(np.float32)
    return (anchors.astype(np.float32), scores, deltas,
            gts.astype(np.float32), labels)


@pytest.mark.parametrize("seed", range(8))
def test_free_anchor_parity(seed):
    anchors, scores, deltas, gts, labels = _case(seed)
    n_gt = len(labels)

    cls_prob = jax.nn.sigmoid(jnp.asarray(scores))
    pos, box_prob = free_anchor_image_loss(
        jnp.asarray(anchors), cls_prob, jnp.asarray(deltas),
        jnp.asarray(gts), jnp.asarray(labels), jnp.ones(n_gt, bool),
        C, K, 0.6, 0.11, 0.75)
    ours_pos = 0.5 * float(pos.sum()) / max(1, n_gt)
    ours_neg = float(negative_bag_loss(cls_prob, box_prob, 2.0, 0.5).sum()
                     ) / max(1, n_gt * K)

    ref_pos, ref_neg = free_anchor_losses_t(
        torch.tensor(anchors), torch.tensor(scores),
        torch.tensor(deltas), torch.tensor(gts),
        torch.tensor(labels), C, pre_anchor_topk=K)
    np.testing.assert_allclose(ours_pos, ref_pos.item(), rtol=1e-4)
    np.testing.assert_allclose(ours_neg, ref_neg.item(), rtol=1e-4)


def test_free_anchor_padded_gt_invariance():
    """Appending invalid gt rows must not change either loss term."""
    anchors, scores, deltas, gts, labels = _case(42)
    cls_prob = jax.nn.sigmoid(jnp.asarray(scores))

    def run(gtb, gtl, gtv):
        pos, bp = free_anchor_image_loss(
            jnp.asarray(anchors), cls_prob, jnp.asarray(deltas),
            jnp.asarray(gtb), jnp.asarray(gtl), jnp.asarray(gtv),
            C, K, 0.6, 0.11, 0.75)
        return float(pos.sum()), np.asarray(bp)

    p1, b1 = run(gts, labels, np.ones(len(labels), bool))
    gts_pad = np.concatenate([gts, np.zeros((2, 4), np.float32)])
    lab_pad = np.concatenate([labels, [0, 0]])
    val_pad = np.concatenate([np.ones(len(labels), bool), [False, False]])
    p2, b2 = run(gts_pad, lab_pad, val_pad)
    np.testing.assert_allclose(p1, p2, rtol=1e-6)
    np.testing.assert_allclose(b1, b2, atol=1e-7)


def test_free_anchor_trains(mesh):
    """A few steps through the DetectionTrainer reduce the total loss."""
    import optax

    from iif_tpu.detection.single_stage import SSTrainCfg
    from iif_tpu.engine.detection import DetectionTrainer

    h = w = 64
    model = FreeAnchor(num_classes=2, depth=18, frozen_stages=-1,
                       pre_anchor_topk=8)
    trainer = DetectionTrainer(model, None, optax.sgd(0.005, momentum=0.9),
                               mesh, SSTrainCfg())
    state = trainer.init_state((h, w, 3))
    rng = np.random.RandomState(0)
    img = rng.randn(2, h, w, 3).astype(np.float32)
    batch = {
        "image": jnp.asarray(img),
        "gt_boxes": jnp.asarray([[[8, 8, 40, 40]], [[16, 16, 56, 56]]],
                                jnp.float32),
        "gt_labels": jnp.zeros((2, 1), jnp.int32),
        "gt_valid": jnp.ones((2, 1), bool),
    }
    state, m0 = trainer._train_step(state, batch)
    for _ in range(8):
        state, m = trainer._train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
