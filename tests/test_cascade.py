"""Cascade MaskRCNN: 3-stage loss + averaged-score inference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.cascade import (
    CascadeMaskRCNN,
    cascade_loss,
    cascade_simple_test,
)
from iif_tpu.detection.detector import DetTestCfg, DetTrainCfg
from iif_tpu.detection.losses import DetIIFLoss

from tests.test_detection import NUM_CLASSES, _demo_inputs, H, W


@pytest.fixture(scope="module")
def cascade_model():
    model = CascadeMaskRCNN(num_classes=NUM_CLASSES, depth=18,
                            frozen_stages=-1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_cascade_loss_all_stages(cascade_model):
    model, variables = cascade_model
    losses_cls = [DetIIFLoss(weights=jnp.ones(NUM_CLASSES + 1))] * 3
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=16, num_mask_rois=4)
    total, losses, aux = cascade_loss(
        model, variables, _demo_inputs(), jax.random.PRNGKey(0),
        losses_cls, cfg)
    for s in range(3):
        assert f"s{s}.loss_cls" in losses
        assert f"s{s}.loss_mask" in losses
        assert np.isfinite(float(losses[f"s{s}.loss_cls"]))
    assert np.isfinite(float(total))
    assert aux["batch_stats"]


def test_cascade_simple_test_shapes(cascade_model):
    model, variables = cascade_model
    losses_cls = [DetIIFLoss(weights=jnp.ones(NUM_CLASSES + 1))] * 3
    cfg = DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=16, max_per_img=5,
                     score_thr=0.0)
    out = cascade_simple_test(model, variables, jnp.zeros((1, H, W, 3)),
                              losses_cls, cfg)
    assert out["boxes"].shape == (1, 5, 4)
    assert out["masks"].shape == (1, 5, 28, 28)
    assert np.isfinite(np.asarray(out["scores"])).all()
