"""GN-all / GN+WS trunks (configs/gn, configs/gn+ws, configs/scratch):
structure, weight-standardization invariance, and a train smoke."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from iif_tpu.detection.detector import MaskRCNN
from iif_tpu.models.layers import ConvWS


def test_conv_ws_standardizes():
    """Output is invariant to affine rescaling of the raw kernel —
    the defining property of weight standardization."""
    conv = ConvWS(8, (3, 3), padding=1, use_bias=False)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 6, 6, 4),
                    jnp.float32)
    v = conv.init(jax.random.PRNGKey(0), x)
    y1 = conv.apply(v, x)
    v2 = jax.tree_util.tree_map(lambda k: k * 3.0 + 0.7, v)
    y2 = conv.apply(v2, x)
    # eps=1e-5 does not rescale with the kernel -> small relative drift
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=2e-3, atol=2e-3)
    # per-output-channel standardized statistics
    k = v["params"]["kernel"]
    ks = (k - k.mean((0, 1, 2))) / jnp.sqrt(k.var((0, 1, 2)) + 1e-5)
    assert np.allclose(np.asarray(ks.mean((0, 1, 2))), 0.0, atol=1e-6)


@pytest.mark.parametrize("conv_ws", [False, True])
def test_gn_all_structure(conv_ws):
    """norm='gn' swaps every trunk BN for GroupNorm: no batch_stats
    collection anywhere, GN scale/bias under the old bn names, and the
    4conv1fc bbox head carries GN'd shared convs."""
    model = MaskRCNN(num_classes=3, depth=18, frozen_stages=-1,
                     norm_eval=False, norm="gn", conv_ws=conv_ws,
                     bbox_head_convs=4, bbox_head_fcs=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        False)
    assert "batch_stats" not in variables or not variables["batch_stats"]
    bb = variables["params"]["backbone"]
    assert set(bb["bn1"]) == {"scale", "bias"}          # GN, not BN
    head = variables["params"]["bbox_head"]
    assert "shared_conv0" in head and "shared_gn3" in head
    assert "shared_fc1" in head and "shared_fc2" not in head
    assert "gn0" in variables["params"]["mask_head"]
    neck = variables["params"]["neck"]
    assert "lateral_gn_0" in neck and "fpn_gn_3" in neck
    if conv_ws:
        assert "bias" not in bb["conv1"]


def test_gn_ws_trains(mesh):
    import optax

    from iif_tpu.detection.detector import DetTrainCfg
    from iif_tpu.detection.losses import DetCrossEntropyLoss
    from iif_tpu.engine.detection import DetectionTrainer

    model = MaskRCNN(num_classes=3, depth=18, frozen_stages=-1,
                     norm_eval=False, norm="gn", conv_ws=True,
                     bbox_head_convs=4, bbox_head_fcs=1)
    trainer = DetectionTrainer(
        model, DetCrossEntropyLoss(num_classes=3),
        optax.sgd(0.002, momentum=0.9), mesh,
        DetTrainCfg(rpn_nms_pre=64, rcnn_num_samples=32,
                    num_mask_rois=8, roi_ext="flat"))
    state = trainer.init_state((64, 64, 3))
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32),
        "gt_boxes": jnp.asarray([[[8, 8, 40, 40]]], jnp.float32),
        "gt_labels": jnp.zeros((1, 1), jnp.int32),
        "gt_valid": jnp.ones((1, 1), bool),
        "gt_masks": jnp.ones((1, 1, 64, 64), jnp.uint8),
    }
    state, m0 = trainer._train_step(state, batch)
    for _ in range(5):
        state, m = trainer._train_step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])


def test_sigmoid_ce_matches_torch_bce():
    """DetCrossEntropyLoss(use_sigmoid=True) == the reference's
    binary_cross_entropy path (one-hot targets, channel sum, sample
    avg_factor)."""
    import torch
    import torch.nn.functional as F

    from iif_tpu.detection.losses import DetCrossEntropyLoss

    rng = np.random.RandomState(1)
    logits = rng.randn(12, 5).astype(np.float32)
    labels = rng.randint(0, 5, 12)
    weight = (rng.rand(12) > 0.2).astype(np.float32)

    ours = DetCrossEntropyLoss(num_classes=4, use_sigmoid=True)(
        jnp.asarray(logits), jnp.asarray(labels),
        weight=jnp.asarray(weight), avg_factor=12.0)

    onehot = torch.zeros(12, 5)
    onehot[torch.arange(12), torch.tensor(labels)] = 1.0
    bce = F.binary_cross_entropy_with_logits(
        torch.tensor(logits), onehot, reduction="none")
    ref = (bce * torch.tensor(weight)[:, None]).sum() / 12.0
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
