"""Tensor-parallel detection heads on the virtual 8-device mesh: a dp x tp
train step runs, stays sharded, and matches the pure-DP loss."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
from iif_tpu.detection.losses import DetIIFLoss
from iif_tpu.engine.detection import DetectionTrainer
from iif_tpu.engine.schedules import build_lr_schedule, build_optimizer
from iif_tpu.parallel import detection_tp_rules, make_mesh, shard_batch

NC = 7      # fc_cls out = 8, fc_reg out = 4 -> both divide tp=2
H = W = 64


def _batch(rng, b):
    gt_boxes = np.zeros((b, 4, 4), np.float32)
    gt_boxes[:, 0] = [8, 8, 40, 40]
    return {
        "image": rng.randn(b, H, W, 3).astype(np.float32),
        "gt_boxes": gt_boxes,
        "gt_labels": np.zeros((b, 4), np.int64),
        "gt_valid": np.pad(np.ones((b, 1), bool), ((0, 0), (0, 3))),
        "gt_masks": np.ones((b, 4, H, W), np.uint8),
    }


def _run(mesh, rules, steps=2):
    cfg = DetTrainCfg(rpn_nms_pre=32, rpn_max_per_img=16,
                      rcnn_num_samples=8, num_mask_rois=2)
    tx = build_optimizer("sgd", build_lr_schedule(0.01, 10, 2))
    trainer = DetectionTrainer(
        MaskRCNN(num_classes=NC, depth=18, frozen_stages=-1),
        DetIIFLoss(weights=jnp.ones(NC + 1)), tx, mesh, cfg,
        param_rules=rules)
    state = trainer.init_state((H, W, 3), seed=0)
    rng = np.random.RandomState(0)
    losses = []
    for _ in range(steps):
        batch = shard_batch(_batch(rng, 8), mesh)
        state, metrics = trainer._train_step(state, batch)
        losses.append(float(metrics["loss"]))
    return state, losses


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_tp_detection_matches_dp():
    mesh_dp = make_mesh()                       # 8 x 1
    mesh_tp = make_mesh(data=4, model=2)        # 4 x 2
    _, dp_losses = _run(mesh_dp, None)
    tp_state, tp_losses = _run(mesh_tp, detection_tp_rules())
    # same math, different placement: losses must agree (fp32 CPU)
    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-3, atol=2e-3)
    k = tp_state.params["bbox_head"]["fc_cls"]["kernel"]
    assert not k.sharding.is_fully_replicated, "fc_cls must stay TP-sharded"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8-device mesh")
def test_tp_rules_skip_non_divisible():
    """1203-ish odd channel counts: the mask predictor (NC=7 channels)
    can't shard over tp=2 — the rule must fall back to replicated
    instead of erroring (the LVIS conv_logits case)."""
    from iif_tpu.parallel import shard_pytree_by_rules

    mesh = make_mesh(data=4, model=2)
    tree = {"conv_logits": {"kernel": jnp.zeros((1, 1, 16, NC))},
            "fc_cls": {"kernel": jnp.zeros((16, NC + 1))}}
    out = shard_pytree_by_rules(tree, mesh, detection_tp_rules())
    assert out["conv_logits"]["kernel"].sharding.is_fully_replicated
    assert not out["fc_cls"]["kernel"].sharding.is_fully_replicated
