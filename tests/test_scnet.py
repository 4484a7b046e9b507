"""SCNet: global-context fusion + presence loss, feature relay into the
single mask head, cascade losses, inference, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.detector import DetTestCfg, DetTrainCfg
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.detection.scnet import (
    FeatureRelayHead,
    GlobalContextHead,
    SCNet,
    scnet_loss,
    scnet_simple_test,
)

H = W = 128
NUM_CLASSES = 6
SMALL_CFG = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                        rcnn_num_samples=16, num_mask_rois=4,
                        roi_ext="flat")
SMALL_TEST = DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                        max_per_img=8, roi_ext="flat")


def _demo_inputs(seed=0):
    rng = np.random.RandomState(seed)
    gt_masks = np.zeros((1, 2, H, W), np.uint8)
    gt_masks[0, 0, 16:64, 16:64] = 1
    gt_masks[0, 1, 30:90, 40:100] = 1
    return {"image": jnp.asarray(
        rng.randn(1, H, W, 3).astype(np.float32)),
        "gt_boxes": jnp.asarray([[[16, 16, 64, 64],
                                  [40, 30, 100, 90]]], jnp.float32),
        "gt_labels": jnp.asarray([[1, 2]]),
        "gt_valid": jnp.asarray([[True, True]]),
        "gt_masks": jnp.asarray(gt_masks)}


def test_global_context_head_shapes():
    head = GlobalContextHead(NUM_CLASSES, channels=16)
    x = jnp.zeros((2, 4, 4, 16))
    v = head.init(jax.random.PRNGKey(0), x)
    mc, pooled = head.apply(v, x)
    assert mc.shape == (2, NUM_CLASSES)
    assert pooled.shape == (2, 16)


def test_feature_relay_shapes():
    head = FeatureRelayHead(out_channels=8, roi_feat_size=7)
    x = jnp.zeros((3, 1024))
    v = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(v, x)
    assert out.shape == (3, 14, 14, 8)


@pytest.fixture(scope="module")
def scnet():
    model = SCNet(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                  num_stages=2)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_scnet_loss(scnet):
    model, variables = scnet
    p = variables["params"]
    assert "glbctx_head" in p and "feat_relay_head" in p
    batch = _demo_inputs()
    losses_cls = [DetCrossEntropyLoss(NUM_CLASSES)] * 2
    total, losses, _ = scnet_loss(model, variables, batch,
                                  jax.random.PRNGKey(0), losses_cls,
                                  SMALL_CFG)
    assert "loss_glbctx" in losses and "loss_mask" in losses
    for s in range(2):
        assert f"s{s}.loss_cls" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))

    def f(params):
        t, _, _ = scnet_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0), losses_cls, SMALL_CFG)
        return t

    grads = jax.grad(f)(variables["params"])
    for head in ("glbctx_head", "feat_relay_head"):
        leaves = jax.tree_util.tree_leaves(grads[head])
        assert max(float(jnp.abs(g).max()) for g in leaves) > 0, head


def test_scnet_simple_test(scnet):
    model, variables = scnet
    batch = _demo_inputs()
    losses_cls = [DetCrossEntropyLoss(NUM_CLASSES)] * 2
    out = scnet_simple_test(model, variables, batch["image"],
                            losses_cls, SMALL_TEST)
    assert out["boxes"].shape == (1, 8, 4)
    assert out["masks"].shape == (1, 8, 28, 28)


def test_scnet_build():
    from iif_tpu.detection import build_detector

    m, _, _ = build_detector(
        {"type": "SCNet", "depth": 18, "num_classes": NUM_CLASSES,
         "num_stages": 2})
    assert isinstance(m, SCNet)
