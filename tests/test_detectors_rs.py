"""DetectoRS: SAC switch semantics, RFP recursion (zero-init rfp_convs
-> step-2 starts equal to step-1 backbone), CARAFE upsampling parity,
cascade loss/test, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.cascade import cascade_loss, cascade_simple_test
from iif_tpu.detection.detector import DetTestCfg, DetTrainCfg
from iif_tpu.detection.detectors_rs import ASPP, DetectoRS
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.models.detectors_resnet import DetectoRSResNet, SAConv

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


def test_saconv_switch_blend():
    """With the zero-init switch conv the gate is sigmoid(1)~0.731 and
    weight_diff=0, so SAC = gate-blend of the SAME standardized conv at
    d=1 and d=3 (plus zero-init contexts)."""
    m = SAConv(8)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 8),
                    jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    w = np.asarray(v["params"]["weight"])
    ws = (w - w.mean((0, 1, 2), keepdims=True)) \
        / (w.std((0, 1, 2), keepdims=True) + 1e-5)
    gate = 1 / (1 + np.exp(-1.0))
    d1 = jax.lax.conv_general_dilated(
        x, jnp.asarray(ws), (1, 1), ((1, 1), (1, 1)),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    d3 = jax.lax.conv_general_dilated(
        x, jnp.asarray(ws), (1, 1), ((3, 3), (3, 3)),
        rhs_dilation=(3, 3),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = gate * np.asarray(d1) + (1 - gate) * np.asarray(d3)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_rfp_zero_init_is_identity_feedback():
    """rfp_convs are zero-init: feeding rfp_feats must not change the
    backbone output at init."""
    model = DetectoRSResNet(depth=50, frozen_stages=-1)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3),
                    jnp.float32)
    v = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    outs1 = model.apply(v, x, False)
    rfp = [jnp.ones((1, 64 // s, 64 // s, 256)) for s in (4, 8, 16, 32)]
    # init again WITH rfp feats so rfp_convs exist, then compare
    v2 = jax.jit(model.init, static_argnums=(2,),
                 static_argnames=())(jax.random.PRNGKey(0), x, False,
                                     rfp_feats=rfp)
    outs2 = model.apply(v2, x, False, rfp_feats=rfp)
    outs1b = model.apply(v2, x, False)
    for a, b in zip(outs2, outs1b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_aspp_output_channels():
    m = ASPP(out_channels=16)
    x = jnp.zeros((1, 8, 8, 256))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 8, 8, 64)


@pytest.fixture(scope="module")
def detectors():
    model = DetectoRS(num_classes=NUM_CLASSES, depth=50,
                      frozen_stages=-1, num_stages=2)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_detectors_loss_and_test(detectors):
    model, variables = detectors
    p = variables["params"]
    assert "rfp_backbone" in p and "rfp_aspp" in p
    assert "conv2" in p["backbone"]["layer2_0"]
    assert "weight_diff" in p["backbone"]["layer2_0"]["conv2"]  # SAC
    batch = _demo_inputs()
    losses_cls = [DetCrossEntropyLoss(NUM_CLASSES)] * 2
    total, losses, _ = cascade_loss(model, variables, batch,
                                    jax.random.PRNGKey(0), losses_cls,
                                    SMALL_CFG)
    assert np.isfinite(float(total))
    out = cascade_simple_test(model, variables, batch["image"],
                              losses_cls, SMALL_TEST)
    assert out["boxes"].shape == (1, 8, 4)


def test_detectors_build():
    from iif_tpu.detection import build_detector

    m, _, _ = build_detector(
        {"type": "DetectoRS", "depth": 50, "num_classes": NUM_CLASSES,
         "num_stages": 2})
    assert isinstance(m, DetectoRS)


def test_carafe_upsample_uniform_kernel_is_avg():
    """A uniform CARAFE kernel must equal the neighborhood average."""
    from iif_tpu.ops.deform import carafe_upsample

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 4, 4, 3), jnp.float32)
    masks = jnp.full((1, 8, 8, 25), 1.0 / 25)
    out = np.asarray(carafe_upsample(x, masks))
    # reference: 5x5 zero-padded average around each low-res parent
    xp = np.pad(np.asarray(x), ((0, 0), (2, 2), (2, 2), (0, 0)))
    for oy, ox_ in ((0, 0), (5, 3), (7, 7)):
        iy, ix = oy // 2, ox_ // 2
        ref = xp[0, iy:iy + 5, ix:ix + 5].mean((0, 1)) * 25 / 25
        np.testing.assert_allclose(out[0, oy, ox_], ref, rtol=1e-4,
                                   atol=1e-5)
