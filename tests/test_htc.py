"""HTC: interleaved cascade + mask info flow + optional semantic branch
— loss/inference smoke, info-flow gradient routing, dispatch."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.detector import DetTestCfg, DetTrainCfg
from iif_tpu.detection.htc import HTC, htc_loss, htc_simple_test
from iif_tpu.detection.losses import DetCrossEntropyLoss

H = W = 128
NUM_CLASSES = 6
MAX_GT = 8

SMALL_CFG = DetTrainCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                        rcnn_num_samples=32, num_mask_rois=8,
                        roi_ext="flat")
SMALL_TEST = DetTestCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                        max_per_img=16, roi_ext="flat")


def _demo_inputs(b=2, seed=0, with_sem=False):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, H, W, 3).astype(np.float32)
    gt_boxes = np.zeros((b, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int64)
    gt_valid = np.zeros((b, MAX_GT), bool)
    gt_masks = np.zeros((b, MAX_GT, H, W), np.uint8)
    for i in range(b):
        n = rng.randint(1, 5)
        for j in range(n):
            x1, y1 = rng.randint(0, W - 40), rng.randint(0, H - 40)
            w, h = rng.randint(16, 40), rng.randint(16, 40)
            gt_boxes[i, j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
            gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
            gt_valid[i, j] = True
            gt_masks[i, j, y1:y1 + h, x1:x1 + w] = 1
    out = {"image": jnp.asarray(images),
           "gt_boxes": jnp.asarray(gt_boxes),
           "gt_labels": jnp.asarray(gt_labels),
           "gt_valid": jnp.asarray(gt_valid),
           "gt_masks": jnp.asarray(gt_masks)}
    if with_sem:
        seg = rng.randint(0, 8, (b, H // 8, W // 8))
        seg[0, 0, 0] = 255          # ignore pixel
        out["gt_semantic_seg"] = jnp.asarray(seg)
    return out


@pytest.fixture(scope="module")
def htc():
    model = HTC(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                num_stages=3)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    return model, variables


def test_htc_params_have_flow_convs(htc):
    model, variables = htc
    p = variables["params"]
    for i in range(3):
        assert f"htc_mask_head_{i}" in p
        assert "conv_res" in p[f"htc_mask_head_{i}"]


def test_htc_loss_all_stages(htc):
    model, variables = htc
    batch = _demo_inputs()
    losses_cls = [DetCrossEntropyLoss(NUM_CLASSES)] * 3
    total, losses, aux = htc_loss(model, variables, batch,
                                  jax.random.PRNGKey(0), losses_cls,
                                  SMALL_CFG)
    for s in range(3):
        for part in ("loss_cls", "loss_bbox", "loss_mask"):
            k = f"s{s}.{part}"
            assert k in losses and np.isfinite(float(losses[k])), k
    assert np.isfinite(float(total))


def test_htc_info_flow_grads(htc):
    """Stage-2's mask loss must backprop into stage-0's conv stack via
    the information flow chain (conv_res of stage 1 and 2)."""
    model, variables = htc
    batch = _demo_inputs()
    losses_cls = [DetCrossEntropyLoss(NUM_CLASSES)] * 3

    def f(params):
        _, losses, _ = htc_loss(
            model, {"params": params,
                    "batch_stats": variables["batch_stats"]},
            batch, jax.random.PRNGKey(0), losses_cls, SMALL_CFG)
        return losses["s2.loss_mask"]

    grads = jax.grad(f)(variables["params"])
    g_res = grads["htc_mask_head_2"]["conv_res"]["kernel"]
    assert float(jnp.abs(g_res).max()) > 0
    g_prev = grads["htc_mask_head_0"]["conv0"]["kernel"]
    assert float(jnp.abs(g_prev).max()) > 0


def test_htc_simple_test(htc):
    model, variables = htc
    batch = _demo_inputs()
    losses_cls = [DetCrossEntropyLoss(NUM_CLASSES)] * 3
    out = htc_simple_test(model, variables, batch["image"], losses_cls,
                          SMALL_TEST)
    assert out["boxes"].shape == (2, 16, 4)
    assert out["masks"].shape == (2, 16, 28, 28)


def test_htc_semantic_branch():
    model = HTC(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                num_stages=2, with_semantic=True, semantic_classes=8)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    assert "semantic_head" in variables["params"]
    batch = _demo_inputs(with_sem=True)
    losses_cls = [DetCrossEntropyLoss(NUM_CLASSES)] * 2
    total, losses, _ = htc_loss(model, variables, batch,
                                jax.random.PRNGKey(0), losses_cls,
                                SMALL_CFG)
    assert "loss_semantic_seg" in losses
    assert np.isfinite(float(losses["loss_semantic_seg"]))
    out = htc_simple_test(model, variables, batch["image"], losses_cls,
                          SMALL_TEST)
    assert out["boxes"].shape == (2, 16, 4)


def test_htc_build_and_trainer_step():
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model, tr, te = build_detector(
        {"type": "HybridTaskCascade", "depth": 18,
         "num_classes": NUM_CLASSES, "frozen_stages": -1,
         "num_stages": 2})
    assert isinstance(model, HTC)
    trainer = DetectionTrainer(
        model, DetCrossEntropyLoss(NUM_CLASSES), optax.sgd(1e-3),
        make_mesh(), train_cfg=SMALL_CFG)
    assert trainer.is_htc
    state = trainer.init_state((H, W, 3))
    state2, metrics = trainer._train_step(state, _demo_inputs())
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
