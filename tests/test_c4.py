"""C4 Faster R-CNN family: ResNet num_stages truncation, the ResLayer
shared head (reference ``mmdet/models/roi_heads/shared_heads/
res_layer.py``), dispatch, loss/inference shapes, trainer integration,
and an overfit learning check (reference model shape:
``configs/_base_/models/faster_rcnn_r50_caffe_c4.py``)."""
import jax
import jax.numpy as jnp
import numpy as np

from iif_tpu.detection import build_detector
from iif_tpu.detection.c4 import (
    C4FasterRCNN,
    c4_anchor_generator,
    c4_loss,
    c4_simple_test,
)
from iif_tpu.detection.detector import DetTestCfg, DetTrainCfg
from iif_tpu.detection.losses import DetCrossEntropyLoss
from iif_tpu.models.resnet import ResLayer, ResNet

H = W = 128
NUM_CLASSES = 4
MAX_GT = 6

SMALL_CFG = DetTrainCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                        rcnn_num_samples=32)
SMALL_TEST = DetTestCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                        max_per_img=16, score_thr=0.0)


def _demo_inputs(b=2, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.randn(b, H, W, 3).astype(np.float32)
    gt_boxes = np.zeros((b, MAX_GT, 4), np.float32)
    gt_labels = np.zeros((b, MAX_GT), np.int64)
    gt_valid = np.zeros((b, MAX_GT), bool)
    for i in range(b):
        for j in range(rng.randint(1, 4)):
            x1, y1 = rng.randint(0, W - 48), rng.randint(0, H - 48)
            w, h = rng.randint(24, 48), rng.randint(24, 48)
            gt_boxes[i, j] = [x1, y1, min(x1 + w, W), min(y1 + h, H)]
            gt_labels[i, j] = rng.randint(0, NUM_CLASSES)
            gt_valid[i, j] = True
    return {"image": jnp.asarray(images),
            "gt_boxes": jnp.asarray(gt_boxes),
            "gt_labels": jnp.asarray(gt_labels),
            "gt_valid": jnp.asarray(gt_valid)}


# ------------------------------------------------------------ components
def test_resnet_num_stages_truncation():
    bb = ResNet((2, 2, 2, 2), "basic", num_stages=3, frozen_stages=-1)
    v = jax.jit(bb.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False, True)
    feats = bb.apply(v, jnp.zeros((1, 64, 64, 3)), False, True)
    assert len(feats) == 3
    # C4 is stride 16: 64/16 = 4
    assert feats[-1].shape == (1, 4, 4, 256)
    # no stage-4 params exist
    assert not any(k.startswith("layer4") for k in v["params"])


def test_res_layer_matches_full_resnet_stage4():
    """ResLayer's param tree == the full ResNet's stage-4 subtree (same
    block layout), so res5 checkpoints map 1:1 onto the shared head."""
    full = ResNet((2, 2, 2, 2), "basic", frozen_stages=-1)
    vf = jax.jit(full.init, static_argnums=(2, 3))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False, True)
    shared = ResLayer(block="basic", n_blocks=2)
    # C4 of the basic-block R18 has 256 channels
    vs = jax.jit(shared.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, 14, 14, 256)), False)
    full_l4 = {k: v for k, v in vf["params"].items()
               if k.startswith("layer4")}
    assert set(vs["params"].keys()) == set(full_l4.keys())
    for k in full_l4:
        a = jax.tree_util.tree_map(lambda x: x.shape, full_l4[k])
        b = jax.tree_util.tree_map(lambda x: x.shape, vs["params"][k])
        assert a == b, k
    # 14x14 -> 7x7 (stride 2)
    out = shared.apply(vs, jnp.zeros((3, 14, 14, 256)), False)
    assert out.shape == (3, 7, 7, 512)   # basic-block res5 width


def test_c4_anchor_schedule():
    """Reference C4 anchors: scales [2,4,8,16,32] x stride-16 base ->
    base anchor areas (16*s)^2 at ratio 1."""
    gen = c4_anchor_generator()
    base = gen.base_anchors[0]
    assert base.shape == (15, 4)
    ratio1 = base[5:10]     # ratio-major layout: ratio 1.0 block
    widths = ratio1[:, 2] - ratio1[:, 0]
    np.testing.assert_allclose(widths, [32, 64, 128, 256, 512], rtol=1e-6)


# -------------------------------------------------------------- dispatch
def test_build_detector_c4():
    m, tr, te = build_detector({"type": "FasterRCNNC4", "depth": 18,
                                "num_classes": NUM_CLASSES,
                                "with_mask": False})
    assert isinstance(m, C4FasterRCNN)
    assert tr is DetTrainCfg and te is DetTestCfg


# ------------------------------------------------------------ loss / test
def test_c4_loss_and_simple_test():
    model = C4FasterRCNN(num_classes=NUM_CLASSES, depth=18,
                         frozen_stages=-1, norm_eval=False)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    # shared head (res5) exists and the backbone stops at C4
    assert "shared_head" in variables["params"]
    assert not any(k.startswith("layer4")
                   for k in variables["params"]["backbone"])
    batch = _demo_inputs()
    loss_cls = DetCrossEntropyLoss(NUM_CLASSES)
    total, losses, aux = c4_loss(model, variables, batch,
                                 jax.random.PRNGKey(0), loss_cls,
                                 SMALL_CFG)
    assert np.isfinite(float(total))
    for k in ("loss_cls", "loss_bbox", "loss_rpn_cls", "loss_rpn_bbox"):
        assert k in losses and np.isfinite(float(losses[k]))
    assert "batch_stats" in aux and aux["batch_stats"]

    out = c4_simple_test(model, variables, batch["image"], loss_cls,
                         SMALL_TEST)
    assert out["boxes"].shape == (2, 16, 4)
    assert out["scores"].shape == out["labels"].shape == (2, 16)


def test_c4_trainer_step():
    import optax

    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model = C4FasterRCNN(num_classes=NUM_CLASSES, depth=18,
                         frozen_stages=-1, norm_eval=False)
    trainer = DetectionTrainer(
        model, DetCrossEntropyLoss(NUM_CLASSES), optax.sgd(1e-3),
        make_mesh(), train_cfg=SMALL_CFG)
    state = trainer.init_state((H, W, 3))
    state2, metrics = trainer._train_step(state, _demo_inputs())
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_c4_overfits_one_box():
    """~80 adam steps on a single-box image: loss halves and the top
    detection lands on the gt box."""
    import optax

    model = C4FasterRCNN(num_classes=2, depth=18, frozen_stages=-1,
                         norm_eval=True)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    rng = np.random.RandomState(3)
    img = rng.randn(1, H, W, 3).astype(np.float32)
    img[0, 32:96, 24:104] += 2.0
    batch = {
        "image": jnp.asarray(img),
        "gt_boxes": jnp.asarray([[[24.0, 32.0, 104.0, 96.0]]
                                 + [[0.0] * 4] * (MAX_GT - 1)]),
        "gt_labels": jnp.zeros((1, MAX_GT), jnp.int32),
        "gt_valid": jnp.asarray([[True] + [False] * (MAX_GT - 1)]),
    }
    loss_cls = DetCrossEntropyLoss(2)
    # grad clip matters: the per-RoI res5 head makes early steps
    # spiky (mmdet's C4 recipes also train with grad_clip)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-3))
    params = variables["params"]
    bs0 = variables.get("batch_stats", {})
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def f(p):
            total, _, _ = c4_loss(
                model, {"params": p, "batch_stats": bs0}, batch,
                jax.random.PRNGKey(0), loss_cls, SMALL_CFG)
            return total

        loss, g = jax.value_and_grad(f)(params)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for _ in range(160):
        params, opt, loss = step(params, opt)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.5 * first
    out = c4_simple_test(model, {"params": params, "batch_stats": bs0},
                         batch["image"], loss_cls,
                         DetTestCfg(rpn_nms_pre=128, rpn_max_per_img=64,
                                    max_per_img=10, score_thr=0.0))
    assert bool(out["valid"][0, 0])
    top = np.asarray(out["boxes"][0, 0])
    gt = np.array([24.0, 32.0, 104.0, 96.0])
    ix1, iy1 = np.maximum(top[:2], gt[:2])
    ix2, iy2 = np.minimum(top[2:], gt[2:])
    inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
    union = ((top[2] - top[0]) * (top[3] - top[1])
             + (gt[2] - gt[0]) * (gt[3] - gt[1]) - inter)
    assert inter / union > 0.3
