"""Double-Head R-CNN and Dynamic R-CNN roi-head variants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection import MaskRCNN
from iif_tpu.detection.bbox_head import DoubleConvFCBBoxHead
from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    maskrcnn_loss,
    maskrcnn_simple_test,
)
from iif_tpu.detection.dynamic_rcnn import (
    dynamic_rcnn_beta_stat,
    dynamic_rcnn_init,
    dynamic_rcnn_iou_stat,
    dynamic_rcnn_update,
)
from iif_tpu.detection.losses import DetCrossEntropyLoss
from tests.test_detection import NUM_CLASSES, _demo_inputs


# ------------------------------------------------------------ double head
def test_double_head_shapes():
    head = DoubleConvFCBBoxHead(num_classes=NUM_CLASSES, num_convs=2,
                                num_fcs=2, conv_out_channels=64,
                                fc_out_channels=32)
    x = jnp.ones((3, 7, 7, 16))
    v = head.init(jax.random.PRNGKey(0), x, x)
    cls, reg, emb = head.apply(v, x, x)
    assert cls.shape == (3, NUM_CLASSES + 1)
    assert reg.shape == (3, NUM_CLASSES * 4)
    assert emb.shape == (3, 32)


def test_double_head_reg_uses_conv_branch_only():
    """The conv branch (reg) must not see x_cls and vice versa."""
    head = DoubleConvFCBBoxHead(num_classes=2, num_convs=1, num_fcs=1,
                                conv_out_channels=32, fc_out_channels=16)
    x = jnp.ones((2, 7, 7, 8))
    v = head.init(jax.random.PRNGKey(0), x, x)
    cls1, reg1, _ = head.apply(v, x, x * 5.0)
    cls2, reg2, _ = head.apply(v, x, x)
    assert np.allclose(np.asarray(cls1), np.asarray(cls2))
    assert not np.allclose(np.asarray(reg1), np.asarray(reg2))


@pytest.fixture(scope="module")
def double_model_and_vars():
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, with_mask=False,
                     frozen_stages=-1, bbox_head_type="double")
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    return model, variables, batch


def test_double_head_train_and_test(double_model_and_vars):
    model, variables, batch = double_model_and_vars
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=32, num_mask_rois=4,
                      rcnn_loss_bbox="smooth_l1")
    lc = DetCrossEntropyLoss(num_classes=NUM_CLASSES)
    total, losses, aux = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(1), lc, cfg)
    assert np.isfinite(float(total))
    # the head's BN stats must ride the mutated collection
    assert "bbox_head" in aux["batch_stats"]
    out = maskrcnn_simple_test(
        model, variables, batch["image"], lc,
        DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32, max_per_img=8))
    assert out["boxes"].shape == (1, 8, 4)

    grads = jax.grad(lambda p: maskrcnn_loss(
        model, {"params": p, "batch_stats": variables["batch_stats"]},
        batch, jax.random.PRNGKey(1), lc, cfg)[0])(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


# ---------------------------------------------------------- dynamic r-cnn
def test_dynamic_iou_stat_matches_numpy():
    rng = np.random.RandomState(0)
    props = rng.uniform(0, 80, (2, 50, 2))
    props = np.concatenate([props, props + rng.uniform(5, 30, (2, 50, 2))],
                           axis=-1).astype(np.float32)
    gtb = np.asarray([[[10, 10, 60, 60], [30, 30, 90, 90]]] * 2,
                     np.float32)
    gtv = np.ones((2, 2), bool)
    pv = np.ones((2, 50), bool)
    got = float(dynamic_rcnn_iou_stat(
        jnp.asarray(props), jnp.asarray(pv), jnp.asarray(gtb),
        jnp.asarray(gtv), iou_topk=7))

    from tests.oracles.sampler_oracle import iou_matrix
    want = np.mean([np.sort(iou_matrix(props[i], gtb[i]).max(1))[::-1][6]
                    for i in range(2)])
    assert got == pytest.approx(want, rel=1e-5)


def test_dynamic_beta_stat_kth_smallest():
    tgts = np.zeros((10, 4), np.float32)
    tgts[:, 0] = np.arange(10) * 0.1
    pos = np.zeros(10, bool)
    pos[2:8] = True      # errors 0.1..0.35 (mean of |dx,dy| = x/2)
    got = float(dynamic_rcnn_beta_stat(jnp.asarray(tgts),
                                       jnp.asarray(pos), 3))
    want = np.sort(np.abs(tgts[pos, :2]).mean(1))[2]
    assert got == pytest.approx(want)
    # more requested than positives -> largest positive error
    got2 = float(dynamic_rcnn_beta_stat(jnp.asarray(tgts),
                                        jnp.asarray(pos), 100))
    assert got2 == pytest.approx(np.sort(np.abs(tgts[pos, :2]).mean(1))[-1])


def test_dynamic_update_refresh_semantics():
    st = dynamic_rcnn_init(initial_iou=0.4, initial_beta=1.0, interval=3)
    ious = [0.5, 0.6, 0.7, 0.2, 0.2, 0.2]
    betas = [0.05, 0.2, 0.1, 0.3, 0.4, 0.5]
    for i in range(3):
        st = dynamic_rcnn_update(st, jnp.asarray(ious[i]),
                                 jnp.asarray(betas[i]), 0.4, 1.0)
    # refresh at step 3: iou = max(0.4, mean(.5,.6,.7)); beta = median
    assert float(st.iou_thr) == pytest.approx(0.6)
    assert float(st.beta) == pytest.approx(0.1)
    for i in range(3, 6):
        st = dynamic_rcnn_update(st, jnp.asarray(ious[i]),
                                 jnp.asarray(betas[i]), 0.4, 1.0)
    # mean 0.2 < initial 0.4 -> clamped to initial; median 0.4 < 1.0
    assert float(st.iou_thr) == pytest.approx(0.4)
    assert float(st.beta) == pytest.approx(0.4)


# ----------------------------------------------------------- DCN backbone
def test_dcn_bottleneck_zero_offset_equals_plain_conv():
    """At init the DCN offsets are zero, so the deformable 3x3 must
    reproduce the plain conv bit-for-bit (given the same weights) — the
    mmdet zero-init contract (configs/dcn)."""
    from iif_tpu.models.resnet import Bottleneck

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 16, 16, 64), jnp.float32)
    b_dcn = Bottleneck(16, stride=2, downsample=True, dcn="dcn")
    v_dcn = b_dcn.init(jax.random.PRNGKey(0), x, True)

    plain = dict(jax.tree_util.tree_map(lambda a: a, v_dcn["params"]))
    w2 = plain.pop("conv2_weight")
    plain.pop("conv2_offset")
    plain["conv2"] = {"kernel": w2}
    b_plain = Bottleneck(16, stride=2, downsample=True)
    y_dcn, _ = b_dcn.apply(v_dcn, x, True, mutable=["batch_stats"])
    y_plain, _ = b_plain.apply(
        {"params": plain, "batch_stats": v_dcn["batch_stats"]}, x, True,
        mutable=["batch_stats"])
    assert y_dcn.shape == y_plain.shape == (1, 8, 8, 64)
    np.testing.assert_allclose(np.asarray(y_dcn), np.asarray(y_plain),
                               atol=1e-5)


def test_dcn_backbone_detector_smoke():
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=50, with_mask=False,
                     frozen_stages=-1, dcn=("", "dcn", "dcn", "dcn"))
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    assert "conv2_offset" in str(
        jax.tree_util.tree_structure(variables["params"]))
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=32, num_mask_rois=4)
    lc = DetCrossEntropyLoss(num_classes=NUM_CLASSES)
    total, _, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(1), lc, cfg)
    assert np.isfinite(float(total))


# ------------------------------------------------------------------- GRoIE
def test_nonlocal_block_zero_init_identity():
    from iif_tpu.detection.necks import NonLocal2d

    blk = NonLocal2d()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 16),
                    jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(v, x)
    # conv_out is zero-initialized -> identity at init (mmcv NonLocal2d)
    assert np.allclose(np.asarray(y), np.asarray(x))


def test_groie_maskrcnn_train_and_test():
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, with_mask=True,
                     frozen_stages=-1, roi_extractor_type="groie")
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    assert "groie_bbox" in variables["params"]
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=32, num_mask_rois=4)
    lc = DetCrossEntropyLoss(num_classes=NUM_CLASSES)
    total, losses, _ = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(1), lc, cfg)
    assert np.isfinite(float(total)) and "loss_mask" in losses
    out = maskrcnn_simple_test(
        model, variables, batch["image"], lc,
        DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32, max_per_img=8))
    assert out["masks"].shape[:2] == (1, 8)


# -------------------------------------------------------------- GHM retina
def test_ghm_retina_trainer_integration():
    """GHM-C/GHM-R replace focal+L1 (configs/ghm); momentum accumulators
    thread through train state and are populated after a step."""
    import optax

    from iif_tpu.detection.single_stage import RetinaNet, SSTrainCfg
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model = RetinaNet(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    cfg = SSTrainCfg(loss_kind="ghm", ghm_bins=8, ghmr_bins=6,
                     ghm_momentum=0.75, ghmr_momentum=0.7)
    lc = DetCrossEntropyLoss(num_classes=NUM_CLASSES)
    trainer = DetectionTrainer(model, lc, optax.sgd(1e-3),
                               make_mesh(), cfg)
    state = trainer.init_state((128, 128, 3))
    assert state.dynamic is not None and state.dynamic.acc_c.shape == (8,)
    batch = _demo_inputs(b=1)
    state, metrics = trainer._train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(state.dynamic.acc_c.sum()) > 0   # histogram populated
    assert float(state.dynamic.acc_r.sum()) > 0


# ------------------------------------------------------------------- PISA
def test_pisa_wiring_maskrcnn_loss():
    """ISR-P + CARL through the detector loss (pisa_roi_head.py):
    finite loss, a loss_carl entry, and gradients flow."""
    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, with_mask=False,
                     frozen_stages=-1)
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=32, num_mask_rois=4,
                      rcnn_isr=(("k", 2.0), ("bias", 0.0)),
                      rcnn_carl=(("k", 1.0), ("bias", 0.2)))
    lc = DetCrossEntropyLoss(num_classes=NUM_CLASSES)
    total, losses, aux = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(1), lc, cfg)
    assert "loss_carl" in losses
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: maskrcnn_loss(
        model, {"params": p, "batch_stats": variables["batch_stats"]},
        batch, jax.random.PRNGKey(1), lc, cfg)[0])(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_dynamic_rcnn_trainer_integration():
    import optax

    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, with_mask=False,
                     frozen_stages=-1)
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=32, num_mask_rois=4,
                      rcnn_dynamic=True, dynamic_interval=2)
    lc = DetCrossEntropyLoss(num_classes=NUM_CLASSES)
    trainer = DetectionTrainer(model, lc, optax.sgd(1e-3),
                               make_mesh(), cfg)
    state = trainer.init_state((128, 128, 3))
    assert state.dynamic is not None
    batch = _demo_inputs(b=1)
    for _ in range(2):
        state, metrics = trainer._train_step(state, batch)
    assert int(state.dynamic.count) == 2
    # after the interval-2 refresh the threshold obeys the max clamp
    assert float(state.dynamic.iou_thr) >= 0.4 - 1e-6
    assert np.isfinite(float(metrics["loss"]))
