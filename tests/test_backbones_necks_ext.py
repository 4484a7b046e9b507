"""Extended backbone/neck coverage: HRNet(+HRFPN), MobileNetV2, PAFPN,
BFP (Libra), NAS-FPN — shapes, detector integration, loss smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.detector import (
    DetTrainCfg,
    MaskRCNN,
    maskrcnn_loss,
)
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.models.hrnet import HRNet
from iif_tpu.models.mobilenet_v2 import MobileNetV2

H = W = 128
NUM_CLASSES = 4
SMALL_CFG = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                        rcnn_num_samples=16, num_mask_rois=4,
                        roi_ext="flat")


def _demo_inputs(b=1, seed=0):
    rng = np.random.RandomState(seed)
    gt_boxes = np.asarray([[[16, 16, 64, 64], [40, 30, 100, 90]]],
                          np.float32)
    gt_masks = np.zeros((1, 2, H, W), np.uint8)
    gt_masks[0, 0, 16:64, 16:64] = 1
    gt_masks[0, 1, 30:90, 40:100] = 1
    return {"image": jnp.asarray(rng.randn(b, H, W, 3).astype(np.float32)),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_labels": jnp.asarray([[1, 2]]),
            "gt_valid": jnp.asarray([[True, True]]),
            "gt_masks": jnp.asarray(gt_masks)}


def test_hrnet_branch_shapes():
    model = HRNet(width=18)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    outs = model.apply(variables, x, False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 18), (1, 8, 8, 36), (1, 4, 4, 72), (1, 2, 2, 144)]


def test_mobilenet_v2_shapes():
    model = MobileNetV2()
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    outs = model.apply(variables, x, False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 24), (1, 8, 8, 32), (1, 4, 4, 96), (1, 2, 2, 1280)]


@pytest.mark.parametrize("backbone,neck", [
    ("hrnet-w18", "hrfpn"),
    ("mobilenet_v2", "fpn"),
])
def test_detector_with_alt_backbone(backbone, neck):
    model = MaskRCNN(num_classes=NUM_CLASSES, backbone_type=backbone,
                     neck_type=neck, frozen_stages=-1, with_mask=False)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    total, losses, _ = maskrcnn_loss(
        model, variables, _demo_inputs(), jax.random.PRNGKey(0),
        DetCrossEntropyLoss(NUM_CLASSES), SMALL_CFG)
    assert np.isfinite(float(total)) and float(total) > 0


@pytest.mark.parametrize("neck", ["pafpn", "bfp", "nasfpn"])
def test_detector_with_alt_neck(neck):
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, neck_type=neck,
                     frozen_stages=-1, with_mask=False)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    total, losses, _ = maskrcnn_loss(
        model, variables, _demo_inputs(), jax.random.PRNGKey(0),
        DetCrossEntropyLoss(NUM_CLASSES), SMALL_CFG)
    assert np.isfinite(float(total)) and float(total) > 0


def test_pvt_shapes():
    from iif_tpu.models.pvt import PVT

    model = PVT(arch="tiny")
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    outs = model.apply(variables, x, False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 64), (1, 8, 8, 128), (1, 4, 4, 320), (1, 2, 2, 512)]


def test_resnest_shapes():
    from iif_tpu.models.resnest import ResNeSt

    model = ResNeSt(depth=50, frozen_stages=-1)
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False)
    outs = model.apply(variables, x, False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024),
        (1, 2, 2, 2048)]


def test_resnest_splat_attention_sums_to_one():
    from iif_tpu.models.resnest import SplAtConv

    m = SplAtConv(8)
    x = jnp.ones((2, 8, 8, 8))
    v = m.init(jax.random.PRNGKey(0), x, False)
    out = m.apply(v, x, False)
    assert out.shape == (2, 8, 8, 8)


@pytest.mark.parametrize("backbone", ["pvt-tiny", "resnest"])
def test_detector_with_transformer_backbones(backbone):
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=50,
                     backbone_type=backbone, frozen_stages=-1,
                     with_mask=False)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    total, losses, _ = maskrcnn_loss(
        model, variables, _demo_inputs(), jax.random.PRNGKey(0),
        DetCrossEntropyLoss(NUM_CLASSES), SMALL_CFG)
    assert np.isfinite(float(total)) and float(total) > 0


def test_adaptive_max_pool2d_torch_parity():
    """BFP's downsample direction is F.adaptive_max_pool2d
    (``mmdet/models/necks/bfp.py:79,99``) — exact window parity,
    including the non-divisible ceil-division FPN sizes (50 -> 13)."""
    import torch
    import torch.nn.functional as F

    from iif_tpu.detection.necks import adaptive_max_pool2d

    rng = np.random.RandomState(3)
    for (h, w, oh, ow) in [(50, 84, 13, 21), (64, 64, 16, 16),
                           (25, 21, 13, 11), (7, 9, 3, 4)]:
        x = rng.randn(2, h, w, 5).astype(np.float32)
        ours = np.asarray(adaptive_max_pool2d(jnp.asarray(x), (oh, ow)))
        ref = F.adaptive_max_pool2d(
            torch.from_numpy(x).permute(0, 3, 1, 2), (oh, ow)
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_array_equal(ours, ref)


def test_bfp_gather_scatter_directions():
    """Reference BFP maxpools when shrinking and nearest-upsamples when
    growing, in BOTH the gather and scatter passes (bfp.py:75-99)."""
    from iif_tpu.detection.necks import BFP

    neck = BFP(out_channels=8, refine_level=1, refine_type="conv")
    ins = [jnp.asarray(np.random.RandomState(i).randn(1, s, s, 8),
                       jnp.float32) for i, s in enumerate([32, 16, 8])]
    var = neck.init(jax.random.PRNGKey(0), ins)
    outs = neck.apply(var, ins)
    assert [o.shape for o in outs] == [i.shape for i in ins]
    # the refine conv is zero-init-free here, but shapes + finiteness
    # prove the pool/resize plumbing; exactness is pinned by the
    # adaptive_max_pool2d parity test above
    assert all(bool(jnp.isfinite(o).all()) for o in outs)
