"""Single-device vs 8-way data-parallel equivalence (VERDICT round-4
item 5): the most basic multi-chip correctness invariant — at identical
global batch, an N-way dp train step is the SAME program in a different
layout, so loss, updated params, and batch statistics must match the
1-device step to float32 reduction-order noise. Covers both workloads
(classification + detection) and grad_accum x dp.

(The sp-vs-dp and tp-vs-dp counterparts live in test_spatial_shard.py
and test_tp_detection.py.)
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from iif_tpu.parallel import make_mesh, shard_batch

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs the 8-device CPU mesh")

H = W = 64
NC = 4


# --------------------------------------------------------------- detection
def _det_batch(rng, b):
    boxes = np.zeros((b, 2, 4), np.float32)
    boxes[:, :, 0] = rng.uniform(2, 20, (b, 2))
    boxes[:, :, 1] = rng.uniform(2, 20, (b, 2))
    boxes[:, :, 2] = boxes[:, :, 0] + rng.uniform(10, 30, (b, 2))
    boxes[:, :, 3] = boxes[:, :, 1] + rng.uniform(10, 30, (b, 2))
    return {
        "image": rng.randn(b, H, W, 3).astype(np.float32),
        "gt_boxes": boxes.clip(0, W - 1),
        "gt_labels": rng.randint(0, NC, (b, 2)),
        "gt_valid": np.ones((b, 2), bool),
        "gt_masks": rng.randint(0, 2, (b, 2, H, W)).astype(np.uint8),
    }


def _det_step(mesh, batch_np, grad_accum=1, n_steps=1):
    from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
    from iif_tpu.detection.losses import DetCrossEntropyLoss
    from iif_tpu.engine.detection import DetectionTrainer

    cfg = DetTrainCfg(rpn_nms_pre=32, rpn_max_per_img=16,
                      rcnn_num_samples=8, num_mask_rois=2)
    trainer = DetectionTrainer(
        MaskRCNN(num_classes=NC, depth=18, frozen_stages=-1),
        DetCrossEntropyLoss(num_classes=NC),
        optax.sgd(0.1, momentum=0.9), mesh, cfg, grad_accum=grad_accum)
    state = trainer.init_state((H, W, 3))
    losses = []
    for s in range(n_steps):
        batch = shard_batch(batch_np[s], mesh)
        state, metrics = trainer._train_step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses, state


def _assert_states_close(state_a, state_b, atol=5e-5):
    for name, tree_a, tree_b in (
            ("params", state_a.params, state_b.params),
            ("batch_stats", state_a.batch_stats, state_b.batch_stats)):
        la = jax.tree_util.tree_leaves(tree_a)
        lb = jax.tree_util.tree_leaves(tree_b)
        assert len(la) == len(lb), name
        worst = max((float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max())
                     for a, b in zip(la, lb) if a.size), default=0.0)
        assert worst < atol, (name, worst)


def test_detection_dp8_matches_single_device(mesh, single_mesh):
    rng = np.random.RandomState(0)
    batches = [_det_batch(rng, 8) for _ in range(2)]
    losses_1, state_1 = _det_step(single_mesh, batches, n_steps=2)
    losses_8, state_8 = _det_step(mesh, batches, n_steps=2)
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-4)
    _assert_states_close(state_8, state_1)


def test_detection_grad_accum_x_dp_matches_single_device(mesh, single_mesh):
    """grad_accum=2 on the 8-way dp mesh == grad_accum=2 on one device:
    the micro-batch scan and the dp sharding must compose."""
    rng = np.random.RandomState(1)
    batches = [_det_batch(rng, 8)]
    losses_1, state_1 = _det_step(single_mesh, batches, grad_accum=2)
    losses_8, state_8 = _det_step(mesh, batches, grad_accum=2)
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-4)
    _assert_states_close(state_8, state_1)


# ----------------------------------------------------------- classification
NC_CLS = 8      # >= 5 so the acc5 meter's top_k is valid


def _cls_step(mesh, batch_np, n_steps=1, norm="bn"):
    from iif_tpu.engine import ClassificationTrainer
    from iif_tpu.losses import get_criterion
    from iif_tpu.models import build_classifier

    trainer = ClassificationTrainer(
        model=build_classifier("resnet20", NC_CLS, None, norm=norm),
        criterion=get_criterion("ce", [8] * NC_CLS),
        tx=optax.sgd(0.05, momentum=0.9), mesh=mesh,
        train_augment=lambda k, x: x,          # identity: RNG-free path
        eval_transform=lambda x: x,
        num_classes=NC_CLS, compute_dtype=jnp.float32, seed=0)
    state = trainer.init_state((32, 32, 3))
    losses = []
    for s in range(n_steps):
        gbatch = shard_batch(batch_np[s], mesh)
        state, metrics = trainer._train_step(state, gbatch,
                                             trainer.frozen_scales)
        losses.append(float(metrics["loss"]))
    return losses, state


def test_classification_dp8_matches_single_device(mesh, single_mesh):
    rng = np.random.RandomState(2)
    batches = [{"image": rng.randn(16, 32, 32, 3).astype(np.float32),
                "label": rng.randint(0, NC_CLS, 16)} for _ in range(2)]
    losses_1, state_1 = _cls_step(single_mesh, batches, n_steps=2)
    losses_8, state_8 = _cls_step(mesh, batches, n_steps=2)
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-4)
    # global-BN batch stats reduce ACROSS the 8 shards, so the reduction
    # order differs by layout; rsqrt + 2 SGD steps at lr .05 amplify the
    # f32 noise to ~5e-4 (measured). The local-BN variant below, whose
    # reductions are layout-aligned, holds the tight 5e-5 bound.
    _assert_states_close(state_8, state_1, atol=2e-3)


def test_classification_local_bn_dp8_matches_single_device(
        mesh, single_mesh):
    """Local BN (bn@8) is *device-count independent*: the grouping is a
    property of the batch layout, so the 8-way dp step still reproduces
    the single-device step bit-for-bit (what makes reference-parity
    experiments runnable on one chip)."""
    rng = np.random.RandomState(3)
    batches = [{"image": rng.randn(16, 32, 32, 3).astype(np.float32),
                "label": rng.randint(0, NC_CLS, 16)}]
    losses_1, state_1 = _cls_step(single_mesh, batches, norm="bn@8")
    losses_8, state_8 = _cls_step(mesh, batches, norm="bn@8")
    np.testing.assert_allclose(losses_8, losses_1, rtol=2e-4)
    _assert_states_close(state_8, state_1)
