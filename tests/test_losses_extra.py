"""Differential tests: losses_extra vs the lifted torch oracles
(seesaw / GHM-C / GHM-R / balanced L1 / PISA ISR-P + CARL)."""
import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from iif_tpu.detection.losses import DetCrossEntropyLoss, smooth_l1_loss
from iif_tpu.detection.losses_extra import (
    SeesawLoss,
    balanced_l1_loss,
    carl_loss,
    ghm_c_loss,
    ghm_r_loss,
    isr_p,
    seesaw_ce_loss,
)
from tests.oracles.loss_oracle import (
    balanced_l1_t,
    carl_t,
    ghmc_t,
    ghmr_t,
    isr_p_t,
    seesaw_activation_t,
    seesaw_ce_loss_t,
    seesaw_forward_t,
)

C = 7  # classes


def _rand_labels(rng, n, with_bg=True):
    hi = C + 1 if with_bg else C
    return rng.integers(0, hi, size=n)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("p,q", [(0.8, 2.0), (0.0, 2.0), (0.8, 0.0)])
def test_seesaw_ce_parity(seed, p, q):
    rng = np.random.default_rng(seed)
    n = 40
    score = rng.normal(size=(n, C)).astype(np.float32)
    labels = rng.integers(0, C, size=n)
    cum = rng.integers(0, 500, size=C).astype(np.float32)

    ours = seesaw_ce_loss(jnp.asarray(score), jnp.asarray(labels),
                          jnp.asarray(cum), p, q, 1e-2)
    ref = seesaw_ce_loss_t(torch.tensor(score), torch.tensor(labels),
                           torch.ones(n), torch.tensor(cum), C, p, q, 1e-2)
    np.testing.assert_allclose(np.asarray(ours).mean(),
                               ref.item(), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("seed", range(5))
def test_seesaw_loss_full_parity(seed):
    """Full forward incl. in-step cum accumulation and objectness."""
    rng = np.random.default_rng(100 + seed)
    n = 48
    score = rng.normal(size=(n, C + 2)).astype(np.float32)
    labels = _rand_labels(rng, n)
    cum0 = rng.integers(0, 300, size=C + 1).astype(np.float32)

    loss = SeesawLoss(cum_samples=jnp.asarray(cum0))
    new_cum = loss.update_cum(jnp.asarray(labels))
    loss = SeesawLoss(cum_samples=new_cum)
    ours = loss(jnp.asarray(score), jnp.asarray(labels),
                weight=jnp.ones(n), avg_factor=jnp.asarray(float(n)))

    cum_t = torch.tensor(cum0.copy())
    l_cls, l_obj = seesaw_forward_t(torch.tensor(score),
                                    torch.tensor(labels), cum_t, C)
    np.testing.assert_allclose(np.asarray(new_cum), cum_t.numpy())
    np.testing.assert_allclose(float(ours), (l_cls + l_obj).item(),
                               rtol=2e-5, atol=2e-6)

    act = loss.get_activation(jnp.asarray(score))
    act_t = seesaw_activation_t(torch.tensor(score))
    np.testing.assert_allclose(np.asarray(act), act_t.numpy(),
                               rtol=2e-5, atol=2e-6)


def test_seesaw_channels_and_padding():
    loss = SeesawLoss(cum_samples=jnp.zeros(C + 1))
    assert loss.get_cls_channels(C) == C + 2
    # padded rows (weight 0) neither count in cum nor in the loss
    score = jnp.zeros((4, C + 2))
    labels = jnp.array([0, 1, C, 2])
    w = jnp.array([1.0, 1.0, 1.0, 0.0])
    cum = loss.update_cum(labels, w)
    assert float(cum.sum()) == 3.0
    v = loss(score, labels, weight=w)
    assert np.isfinite(float(v))


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("momentum", [0.0, 0.75])
def test_ghmc_parity(seed, momentum):
    rng = np.random.default_rng(seed)
    n = 60
    pred = rng.normal(size=(n, C)).astype(np.float32) * 3
    target = (rng.random((n, C)) < 0.3).astype(np.float32)
    lw = (rng.random((n, C)) < 0.9).astype(np.float32)

    acc = np.zeros(10, np.float32)
    acc_t = torch.zeros(10)
    ours_acc = jnp.asarray(acc)
    for _ in range(2):  # two steps exercise the momentum accumulator
        ours, ours_acc = ghm_c_loss(jnp.asarray(pred), jnp.asarray(target),
                                    jnp.asarray(lw), bins=10,
                                    momentum=momentum, acc_sum=ours_acc)
        ref = ghmc_t(torch.tensor(pred), torch.tensor(target),
                     torch.tensor(lw), bins=10, momentum=momentum,
                     acc_sum=acc_t)
        np.testing.assert_allclose(float(ours), ref.item(), rtol=2e-5,
                                   atol=1e-6)
        if momentum == 0:
            break
    np.testing.assert_allclose(np.asarray(ours_acc), acc_t.numpy(),
                               rtol=1e-5)


@pytest.mark.parametrize("seed", range(3))
@pytest.mark.parametrize("momentum", [0.0, 0.5])
def test_ghmr_parity(seed, momentum):
    rng = np.random.default_rng(10 + seed)
    n = 50
    pred = rng.normal(size=(n, 4)).astype(np.float32)
    target = rng.normal(size=(n, 4)).astype(np.float32)
    lw = (rng.random((n, 4)) < 0.85).astype(np.float32)

    acc_t = torch.zeros(10)
    ours_acc = jnp.zeros(10)
    for _ in range(2):
        ours, ours_acc = ghm_r_loss(jnp.asarray(pred), jnp.asarray(target),
                                    jnp.asarray(lw), mu=0.02, bins=10,
                                    momentum=momentum, acc_sum=ours_acc)
        ref = ghmr_t(torch.tensor(pred), torch.tensor(target),
                     torch.tensor(lw), mu=0.02, bins=10,
                     momentum=momentum, acc_sum=acc_t)
        np.testing.assert_allclose(float(ours), ref.item(), rtol=2e-5,
                                   atol=1e-6)
        if momentum == 0:
            break


@pytest.mark.parametrize("seed", range(3))
def test_balanced_l1_parity(seed):
    rng = np.random.default_rng(20 + seed)
    pred = rng.normal(size=(30, 4)).astype(np.float32) * 2
    target = rng.normal(size=(30, 4)).astype(np.float32)
    ours = balanced_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                            beta=1.0, alpha=0.5, gamma=1.5)
    ref = balanced_l1_t(torch.tensor(pred), torch.tensor(target))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-5,
                               atol=2e-6)


@pytest.mark.parametrize("seed", range(6))
def test_isr_p_parity(seed):
    rng = np.random.default_rng(30 + seed)
    n = 64
    labels = _rand_labels(rng, n)                # some bg rows
    lw = np.ones(n, np.float32)
    ious = rng.random(n).astype(np.float32)      # distinct w.p. 1
    gts = rng.integers(0, 6, size=n)
    score = rng.normal(size=(n, C + 1)).astype(np.float32)

    loss = DetCrossEntropyLoss(num_classes=C)
    ours = isr_p(jnp.asarray(score), jnp.asarray(labels), jnp.asarray(lw),
                 jnp.asarray(ious), jnp.asarray(gts), loss, C,
                 k=2.0, bias=0.0)
    ref = isr_p_t(torch.tensor(score), torch.tensor(labels),
                  torch.tensor(lw), torch.tensor(ious), torch.tensor(gts),
                  C, k=2.0, bias=0.0)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4,
                               atol=2e-5)


def test_isr_p_all_background():
    n = 8
    labels = jnp.full((n,), C)
    lw = jnp.ones(n)
    out = isr_p(jnp.zeros((n, C + 1)), labels, lw, jnp.zeros(n),
                jnp.zeros(n, jnp.int32), DetCrossEntropyLoss(num_classes=C),
                C)
    np.testing.assert_allclose(np.asarray(out), np.ones(n))


def test_seesaw_maskrcnn_train_step(mesh):
    """SeesawLoss end-to-end through the DetectionTrainer: C+2 classifier
    channels, cum_samples threaded through train state, finite losses,
    balanced-L1 regression option active."""
    import optax

    from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
    from iif_tpu.engine.detection import DetectionTrainer

    nc, h, w = 4, 64, 64
    model = MaskRCNN(num_classes=nc, depth=18, frozen_stages=-1,
                     with_mask=False, cls_channels=nc + 2)
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=16, num_mask_rois=4,
                      rcnn_loss_bbox="balanced_l1")
    loss = SeesawLoss(cum_samples=jnp.zeros(nc + 1))
    trainer = DetectionTrainer(model, loss, optax.sgd(0.01), mesh, cfg)
    state = trainer.init_state((h, w, 3))
    assert state.seesaw_cum is not None

    rng = np.random.RandomState(0)
    boxes = np.array([[[4.0, 4.0, 40.0, 40.0]]] * 2, np.float32)
    batch = {
        "image": jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32)),
        "gt_boxes": jnp.asarray(boxes),
        "gt_labels": jnp.asarray(rng.randint(0, nc, (2, 1))),
        "gt_valid": jnp.ones((2, 1), bool),
    }
    state2, metrics = trainer._train_step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # cum counters moved: 16 sampled rois per image x 2 images counted
    assert float(state2.seesaw_cum.sum()) == 32.0
    state3, _ = trainer._train_step(state2, batch)
    assert float(state3.seesaw_cum.sum()) == 64.0


@pytest.mark.parametrize("seed", range(4))
@pytest.mark.parametrize("sigmoid", [False, True])
def test_carl_parity(seed, sigmoid):
    rng = np.random.default_rng(40 + seed)
    n = 48
    labels = _rand_labels(rng, n)
    score = rng.normal(size=(n, C + 1)).astype(np.float32)
    pred = rng.normal(size=(n, 4)).astype(np.float32)
    tgt = rng.normal(size=(n, 4)).astype(np.float32)

    ours = carl_loss(jnp.asarray(score), jnp.asarray(labels),
                     jnp.ones(n), jnp.asarray(pred), jnp.asarray(tgt),
                     lambda a, b: smooth_l1_loss(a, b, beta=1.0), C,
                     k=1.0, bias=0.2, sigmoid=sigmoid)
    ref = carl_t(torch.tensor(score), torch.tensor(labels),
                 torch.tensor(pred), torch.tensor(tgt),
                 lambda a, b: F.smooth_l1_loss(a, b, reduction='none'),
                 C, k=1.0, bias=0.2, sigmoid=sigmoid)
    np.testing.assert_allclose(float(ours), ref.item(), rtol=2e-5,
                               atol=2e-6)
