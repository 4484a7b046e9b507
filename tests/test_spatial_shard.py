"""Spatial (image-H) sharding of the detection canvas.

The 'spatial' mesh axis splits the backbone's H dimension across devices
(GSPMD halo-exchange convs; reference has no equivalent — NCCL DP only),
with FPN outputs gathered at the head boundary. Numerics must match the
data-parallel-only step exactly (same program, different layout).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
from iif_tpu.detection.losses import DetIIFLoss
from iif_tpu.engine.detection import DetectionTrainer
from iif_tpu.parallel import make_mesh, shard_batch
from iif_tpu.parallel.mesh import spatial_size


def _tiny_batch(rng, b, h, w, g=4):
    gt_boxes = np.zeros((b, g, 4), np.float32)
    gt_boxes[:, 0] = [8, 8, 40, 40]
    gt_boxes[:, 1] = [4, 12, 30, 44]
    return {
        "image": rng.randn(b, h, w, 3).astype(np.float32),
        "gt_boxes": gt_boxes,
        "gt_labels": np.zeros((b, g), np.int64),
        "gt_valid": np.pad(np.ones((b, 2), bool), ((0, 0), (0, g - 2))),
        "gt_masks": np.ones((b, g, h, w), np.uint8),
    }


def _run_step(mesh, batch_np):
    ncls = 4
    cfg = DetTrainCfg(rpn_nms_pre=32, rpn_max_per_img=16,
                      rcnn_num_samples=8, num_mask_rois=2)
    trainer = DetectionTrainer(
        MaskRCNN(num_classes=ncls, depth=18, frozen_stages=-1),
        DetIIFLoss(weights=jnp.ones(ncls + 1)),
        optax.sgd(0.1, momentum=0.9), mesh, cfg)
    state = trainer.init_state((batch_np["image"].shape[1],
                               batch_np["image"].shape[2], 3))
    batch = shard_batch(batch_np, mesh)
    state, metrics = trainer._train_step(state, batch)
    return float(metrics["loss"]), state


def test_spatial_mesh_construction():
    n = len(jax.devices())
    if n < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_mesh(spatial=2)
    assert mesh.axis_names == ("data", "spatial", "model")
    assert spatial_size(mesh) == 2
    assert spatial_size(make_mesh()) == 1


def test_spatial_step_matches_dp():
    n = len(jax.devices())
    if n < 4:
        pytest.skip("needs >= 4 devices")
    rng = np.random.RandomState(0)
    b, h, w = 2, 64, 64
    batch_np = _tiny_batch(rng, b, h, w)

    loss_dp, state_dp = _run_step(make_mesh(data=2, devices=jax.devices()[:2]),
                                  batch_np)
    loss_sp, state_sp = _run_step(
        make_mesh(data=2, spatial=2, devices=jax.devices()[:4]), batch_np)
    assert np.isfinite(loss_sp)
    np.testing.assert_allclose(loss_sp, loss_dp, rtol=2e-4)
    # one representative grad-updated param must match too
    k_dp = np.asarray(state_dp.params["bbox_head"]["fc_cls"]["kernel"])
    k_sp = np.asarray(state_sp.params["bbox_head"]["fc_cls"]["kernel"])
    np.testing.assert_allclose(k_sp, k_dp, atol=5e-5)


def test_spatial_image_batch_sharding():
    n = len(jax.devices())
    if n < 4:
        pytest.skip("needs >= 4 devices")
    mesh = make_mesh(data=2, spatial=2, devices=jax.devices()[:4])
    rng = np.random.RandomState(1)
    batch = shard_batch(_tiny_batch(rng, 2, 64, 64), mesh)
    spec = batch["image"].sharding.spec
    assert tuple(spec)[:2] == ("data", "spatial")
    # non-canvas leaves stay data-sharded only
    assert tuple(batch["gt_masks"].sharding.spec)[:1] == ("data",)
