"""Guided Anchoring (GA-RetinaNet): bounded-IoU oracle parity, painted
loc targets golden, approx-max assignment, and e2e train/test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from iif_tpu.detection.guided_anchor import (
    GARetinaNet,
    approx_max_iou_overlaps,
    bounded_iou_loss,
    ga_loc_targets,
    ga_retina_loss,
    ga_retina_simple_test,
    guided_anchors,
)
from iif_tpu.detection.single_stage import SSTestCfg, SSTrainCfg
from tests.test_detection import NUM_CLASSES, _demo_inputs


def _bounded_iou_t(pred, target, beta=0.2, eps=1e-3):
    """Reference math (iou_loss.py:55-100) in torch."""
    pcx = (pred[:, 0] + pred[:, 2]) * 0.5
    pcy = (pred[:, 1] + pred[:, 3]) * 0.5
    pw = pred[:, 2] - pred[:, 0]
    ph = pred[:, 3] - pred[:, 1]
    tcx = (target[:, 0] + target[:, 2]) * 0.5
    tcy = (target[:, 1] + target[:, 3]) * 0.5
    tw = target[:, 2] - target[:, 0]
    th = target[:, 3] - target[:, 1]
    dx = tcx - pcx
    dy = tcy - pcy
    ldx = 1 - torch.max((tw - 2 * dx.abs()) / (tw + 2 * dx.abs() + eps),
                        torch.zeros_like(dx))
    ldy = 1 - torch.max((th - 2 * dy.abs()) / (th + 2 * dy.abs() + eps),
                        torch.zeros_like(dy))
    ldw = 1 - torch.min(tw / (pw + eps), pw / (tw + eps))
    ldh = 1 - torch.min(th / (ph + eps), ph / (th + eps))
    comb = torch.stack([ldx, ldy, ldw, ldh], -1)
    return torch.where(comb < beta, 0.5 * comb * comb / beta,
                       comb - 0.5 * beta)


@pytest.mark.parametrize("seed", range(5))
def test_bounded_iou_parity(seed):
    rng = np.random.RandomState(seed)
    pred = rng.uniform(10, 90, (20, 2))
    pred = np.concatenate([pred, pred + rng.uniform(5, 40, (20, 2))],
                          axis=1).astype(np.float32)
    tgt = pred + rng.uniform(-4, 4, pred.shape).astype(np.float32)
    tgt[:, 2:] = np.maximum(tgt[:, 2:], tgt[:, :2] + 2)
    ours = np.asarray(bounded_iou_loss(jnp.asarray(pred),
                                       jnp.asarray(tgt)))
    ref = _bounded_iou_t(torch.tensor(pred), torch.tensor(tgt)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_approx_max_overlaps():
    # square at origin; one approx matches gt exactly -> overlap 1
    approxs = jnp.asarray([[[0, 0, 10, 10], [0, 0, 20, 20],
                            [5, 5, 15, 15]]], jnp.float32)
    gt = jnp.asarray([[0, 0, 20, 20]], jnp.float32)
    o = approx_max_iou_overlaps(approxs, gt, jnp.ones(1, bool))
    assert o.shape == (1, 1)
    assert float(o[0, 0]) == pytest.approx(1.0)


def test_ga_loc_targets_golden():
    """One 64x64 gt at stride-8 scale: target level =
    floor(log2(64/32)+0.5)=1 (stride 16); center 20% region positive."""
    gtb = jnp.asarray([[32.0, 32.0, 96.0, 96.0]])
    gtv = jnp.ones(1, bool)
    shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    t, w = ga_loc_targets(gtb, gtv, shapes)
    t = [np.asarray(x) for x in t]
    w = [np.asarray(x) for x in w]
    assert t[1].sum() > 0 and t[0].sum() == 0 and t[2].sum() == 0
    # center region on level 1 (stride 16): box/16 = [2,2,6,6],
    # r1=0.4 -> [round(3.6), round(3.6)]..[round(4.4)] = cells 4..4
    assert t[1][4, 4] == 1.0
    # its weight is 1; the ignore ring is 0; far cells 0.1
    assert w[1][4, 4] == 1.0
    assert w[1][3, 3] == 0.0   # inside ignore (r2=0.25 -> 3..5)
    assert w[1][0, 0] == 0.1
    # adjacent levels get an ignore ring at the projected region
    assert (w[0] == 0.0).any() and (w[2] == 0.0).any()
    assert t[1].shape == (8, 8)


def test_guided_anchor_decode():
    sq = jnp.asarray([[10.0, 10.0, 26.0, 26.0]])
    # dw=dh=0 -> identical anchor
    anc = guided_anchors(sq, jnp.zeros((1, 2)))
    np.testing.assert_allclose(np.asarray(anc), np.asarray(sq), atol=1e-4)
    # dw=log(2) -> width doubles around the center
    anc2 = guided_anchors(sq, jnp.asarray([[np.log(2.0), 0.0]]))
    assert float(anc2[0, 2] - anc2[0, 0]) == pytest.approx(32.0, rel=1e-4)


def test_pisa_retina_loss():
    """ISR-P + CARL wired into the retina focal path (configs/pisa)."""
    from iif_tpu.detection.single_stage import RetinaNet, retinanet_loss

    model = RetinaNet(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    cfg = SSTrainCfg(isr=(("k", 2.0), ("bias", 0.0)),
                     carl=(("k", 1.0), ("bias", 0.2)))
    total, losses, _ = retinanet_loss(
        model, variables, batch, jax.random.PRNGKey(1), cfg)
    assert "loss_carl" in losses
    assert np.isfinite(float(total))
    # plain focal path unchanged
    t2, l2, _ = retinanet_loss(
        model, variables, batch, jax.random.PRNGKey(1), SSTrainCfg())
    assert "loss_carl" not in l2 and np.isfinite(float(t2))
    grads = jax.grad(lambda p: retinanet_loss(
        model, {"params": p, "batch_stats": variables["batch_stats"]},
        batch, jax.random.PRNGKey(1), cfg)[0])(variables["params"])
    assert all(np.isfinite(np.asarray(g)).all()
               for g in jax.tree_util.tree_leaves(grads))


def test_retina_sepbn_nasfpn_train_and_test():
    """NAS-FPN recipe: RetinaSepBNHead (shared convs, per-level BN) on
    the NASFPN neck (configs/nas_fpn)."""
    from iif_tpu.detection.single_stage import (
        RetinaNet,
        retinanet_loss,
        retinanet_simple_test,
    )

    model = RetinaNet(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1,
                      head_type="sepbn", neck_type="nasfpn")
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    # per-level BN params exist and conv kernels are shared (one copy)
    head = variables["params"]["bbox_head"]
    assert "cls_bn_l0_0" in head and "cls_bn_l4_3" in head
    assert "cls_conv_0" in head
    total, losses, aux = retinanet_loss(
        model, variables, batch, jax.random.PRNGKey(1), SSTrainCfg())
    assert np.isfinite(float(total))
    assert "bbox_head" in aux["batch_stats"]   # head BN stats threaded
    out = retinanet_simple_test(model, variables, batch["image"],
                                SSTestCfg(nms_pre=64, max_per_img=8))
    assert out["boxes"].shape == (1, 8, 4)


def test_ga_retina_train_and_test():
    model = GARetinaNet(num_classes=NUM_CLASSES, depth=18,
                        frozen_stages=-1)
    batch = _demo_inputs(b=1)
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0), batch["image"], False)
    total, losses, aux = ga_retina_loss(
        model, variables, batch, jax.random.PRNGKey(1), SSTrainCfg())
    assert {"loss_cls", "loss_bbox", "loss_shape", "loss_loc"} \
        <= set(losses)
    assert np.isfinite(float(total))
    grads = jax.grad(lambda p: ga_retina_loss(
        model, {"params": p, "batch_stats": variables["batch_stats"]},
        batch, jax.random.PRNGKey(1), SSTrainCfg())[0])(
        variables["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # the shape branch must receive gradient (through the bounded-IoU)
    gsh = grads["ga_head"]["conv_shape"]["kernel"]
    assert float(jnp.abs(gsh).sum()) > 0

    out = ga_retina_simple_test(
        model, variables, batch["image"],
        SSTestCfg(nms_pre=64, max_per_img=8))
    assert out["boxes"].shape == (1, 8, 4)
