"""SABL: bucketing coder parity vs the torch oracle + detector e2e."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from iif_tpu.detection.sabl import SABLHead, bbox2bucket, bucket2bbox
from tests.oracles.sabl_oracle import bbox2bucket_t, bucket2bbox_t
from tests.test_detection import NUM_CLASSES, _demo_inputs


def _random_props(rng, n, size=300):
    x1 = rng.uniform(0, size - 60, n)
    y1 = rng.uniform(0, size - 60, n)
    w = rng.uniform(20, 60, n)
    h = rng.uniform(20, 60, n)
    return np.stack([x1, y1, x1 + w, y1 + h], 1).astype(np.float32)


@pytest.mark.parametrize("seed", range(8))
def test_bbox2bucket_parity(seed):
    rng = np.random.RandomState(seed)
    n = 40
    props = _random_props(rng, n)
    # gts = jittered proposals (realistic positive pairs)
    gt = props + rng.uniform(-8, 8, props.shape).astype(np.float32)
    gt[:, 2:] = np.maximum(gt[:, 2:], gt[:, :2] + 4)

    off, ow, bl, cw = bbox2bucket(jnp.asarray(props), jnp.asarray(gt))
    off_t, ow_t, bl_t, cw_t = bbox2bucket_t(
        torch.tensor(props), torch.tensor(gt), 14, 1.7)
    np.testing.assert_allclose(np.asarray(off), off_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ow), ow_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(bl), bl_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cw), cw_t.numpy(), atol=1e-6)


@pytest.mark.parametrize("seed", range(8))
def test_bucket2bbox_parity(seed):
    rng = np.random.RandomState(seed)
    n = 32
    props = _random_props(rng, n)
    cls_preds = rng.randn(n, 28).astype(np.float32)
    off_preds = rng.randn(n, 28).astype(np.float32) * 0.3

    boxes, conf = bucket2bbox(jnp.asarray(props), jnp.asarray(cls_preds),
                              jnp.asarray(off_preds), 14, 1.7,
                              max_shape=(300, 300))
    boxes_t, conf_t = bucket2bbox_t(
        torch.tensor(props), torch.tensor(cls_preds),
        torch.tensor(off_preds), 14, 1.7, max_shape=(300, 300))
    np.testing.assert_allclose(np.asarray(boxes), boxes_t.numpy(),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(conf), conf_t.numpy(), atol=1e-5)


def test_sabl_head_shapes():
    head = SABLHead(num_classes=NUM_CLASSES, cls_out_channels=64)
    x = jnp.ones((3, 7, 7, 32))
    v = head.init(jax.random.PRNGKey(0), x)
    cls, (bcls, boff), emb = head.apply(v, x)
    assert cls.shape == (3, NUM_CLASSES + 1)
    assert bcls.shape == (3, 28) and boff.shape == (3, 28)
    # fc_reg heads must be SHARED between x and y branches
    flat = jax.tree_util.tree_leaves_with_path(v["params"])
    names = {"/".join(str(k.key) for k in p) for p, _ in flat}
    assert any("fc_reg_offset" in s for s in names)


def test_sabl_fasterrcnn_train_and_test():
    from iif_tpu.detection import MaskRCNN
    from iif_tpu.detection.detector import (
        DetTestCfg,
        DetTrainCfg,
        maskrcnn_loss,
        maskrcnn_simple_test,
    )
    from iif_tpu.detection.losses import DetCrossEntropyLoss

    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, with_mask=False,
                     frozen_stages=-1, bbox_head_type="sabl")
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=32, num_mask_rois=4)
    lc = DetCrossEntropyLoss(num_classes=NUM_CLASSES)
    total, losses, aux = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(1), lc, cfg)
    assert {"loss_cls", "loss_bbox_cls", "loss_bbox_reg"} <= set(losses)
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: maskrcnn_loss(
        model, {"params": p, "batch_stats": variables["batch_stats"]},
        batch, jax.random.PRNGKey(1), lc, cfg)[0])(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))

    out = maskrcnn_simple_test(
        model, variables, batch["image"], lc,
        DetTestCfg(rpn_nms_pre=64, rpn_max_per_img=32, max_per_img=8))
    assert out["boxes"].shape == (1, 8, 4)
    assert np.isfinite(np.asarray(out["scores"])).all()
