"""TridentNet: weight sharing across dilated branches, branch-as-batch
training semantics, single-branch inference, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.detector import DetTestCfg, DetTrainCfg
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.detection.trident import (
    TridentFasterRCNN,
    trident_loss,
    trident_simple_test,
)
from iif_tpu.models.trident_resnet import TridentResNet

H = W = 128
NUM_CLASSES = 6
SMALL_CFG = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                        rcnn_num_samples=16, num_mask_rois=4,
                        roi_ext="flat")
SMALL_TEST = DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                        max_per_img=8, roi_ext="flat")


def _demo_inputs(seed=0):
    rng = np.random.RandomState(seed)
    return {"image": jnp.asarray(
        rng.randn(1, H, W, 3).astype(np.float32)),
        "gt_boxes": jnp.asarray([[[16, 16, 64, 64],
                                  [40, 30, 100, 90]]], jnp.float32),
        "gt_labels": jnp.asarray([[1, 2]]),
        "gt_valid": jnp.asarray([[True, True]])}


def test_trident_backbone_branches_share_weights():
    model = TridentResNet(depth=50, frozen_stages=-1)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, True)
    # train: 3 branches stack along batch; C5 at stride 16
    out = model.apply(v, x, True,
                      mutable=["batch_stats"])[0][0]
    assert out.shape == (3, 4, 4, 2048)
    # test: single branch
    out_t = model.apply(v, x, False)[0]
    assert out_t.shape == (1, 4, 4, 2048)
    # the shared layer4 params exist ONCE (no per-branch copies)
    p = v["params"]
    assert "layer4_0" in p
    assert not any(k.startswith("layer4_0_branch") for k in p)


def test_trident_dilation_changes_output():
    """Different branch dilations must produce different features from
    the same weights (the trident receptive-field mechanism)."""
    model = TridentResNet(depth=50, frozen_stages=-1,
                          trident_dilations=(1, 2, 3))
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    v = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, True)
    out = model.apply(v, x, True, mutable=["batch_stats"])[0][0]
    d01 = float(jnp.abs(out[0] - out[1]).max())
    d12 = float(jnp.abs(out[1] - out[2]).max())
    assert d01 > 1e-4 and d12 > 1e-4


@pytest.fixture(scope="module")
def trident():
    model = TridentFasterRCNN(num_classes=NUM_CLASSES, depth=50,
                              frozen_stages=-1)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_trident_loss_and_test(trident):
    model, variables = trident
    batch = _demo_inputs()
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    total, losses, _ = trident_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls,
        SMALL_CFG)
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
        assert k in losses and np.isfinite(float(losses[k])), k
    out = trident_simple_test(model, variables, batch["image"],
                              loss_cls, SMALL_TEST)
    assert out["boxes"].shape == (1, 8, 4)


def test_trident_build_and_trainer():
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model, _, _ = build_detector(
        {"type": "TridentFasterRCNN", "depth": 50,
         "num_classes": NUM_CLASSES, "frozen_stages": -1})
    assert isinstance(model, TridentFasterRCNN)
    trainer = DetectionTrainer(
        model, DetCrossEntropyLoss(NUM_CLASSES), optax.sgd(1e-3),
        make_mesh(), train_cfg=SMALL_CFG)
    assert trainer.is_trident
    state = trainer.init_state((H, W, 3))
    state2, metrics = trainer._train_step(state, _demo_inputs())
    assert np.isfinite(float(metrics["loss"]))
