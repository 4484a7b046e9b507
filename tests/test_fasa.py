"""FASA: EMA feature stats, virtual-feature generation, cum-loss counters,
host-side adaptive sampling, and the integrated detector path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.detection.fasa import (
    FasaState,
    fasa_accumulate_val,
    fasa_aug_loss,
    fasa_dynamic_sampling,
    fasa_generate,
    fasa_reset_cums,
    fasa_update,
    init_fasa_state,
)
from iif_tpu.detection.losses import DetIIFLoss

C, D = 5, 16


def _state():
    return init_fasa_state(np.array([100, 50, 20, 5, 1]), feat_dim=D)


def test_init_probs_monotone_in_rarity():
    s = _state()
    p = np.asarray(s.prob_list)
    assert (np.diff(p) > 0).all()  # rarer class -> higher sampling prob
    assert p.max() <= 1.0


def test_fasa_update_first_then_ema():
    s = _state()
    emb = jnp.ones((4, D)) * 2.0
    labels = jnp.asarray([1, 1, 1, 1])
    w = jnp.ones(4)
    s1 = fasa_update(s, emb, labels, w, decay_ratio=0.1)
    # first update: direct set
    np.testing.assert_allclose(np.asarray(s1.feature_mean)[1], 2.0, atol=1e-6)
    assert float(s1.feature_used[1]) == 1
    assert float(s1.feature_used[0]) == 0

    emb2 = jnp.ones((2, D)) * 4.0
    s2 = fasa_update(s1, emb2, jnp.asarray([1, 1]), jnp.ones(2), 0.1)
    # EMA: 0.1*4 + 0.9*2 = 2.2
    np.testing.assert_allclose(np.asarray(s2.feature_mean)[1], 2.2, atol=1e-5)


def test_fasa_update_ignores_masked_rois():
    s = _state()
    emb = jnp.stack([jnp.ones(D), 100.0 * jnp.ones(D)])
    labels = jnp.asarray([2, 2])
    w = jnp.asarray([1.0, 0.0])  # second is a padded/neg slot
    s1 = fasa_update(s, emb, labels, w)
    np.testing.assert_allclose(np.asarray(s1.feature_mean)[2], 1.0, atol=1e-5)


def test_fasa_update_unbiased_var():
    s = _state()
    emb = jnp.asarray([[0.0] * D, [2.0] * D])
    s1 = fasa_update(s, emb, jnp.asarray([0, 0]), jnp.ones(2))
    # unbiased var of {0,2} = 2.0
    np.testing.assert_allclose(np.asarray(s1.feature_var)[0], 2.0, atol=1e-5)


def test_fasa_generate_respects_used_and_prob():
    s = _state()
    s = s._replace(feature_used=jnp.asarray([1.0, 0, 0, 0, 1.0]),
                   prob_list=jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0]))
    feats, labels, select = fasa_generate(s, jax.random.PRNGKey(0))
    sel = np.asarray(select)
    assert sel[0] == 1.0      # used & prob 1
    assert sel[1] == 0.0      # never seen
    assert sel[4] == 0.0      # prob 0
    assert feats.shape == (C, D)


def test_fasa_aug_loss_runs():
    s = _state()
    s = s._replace(feature_used=jnp.ones(C),
                   prob_list=jnp.ones(C))
    loss_cls = DetIIFLoss(weights=jnp.ones(C + 1))
    w_cls = jax.random.normal(jax.random.PRNGKey(1), (D, C + 1))
    l = fasa_aug_loss(s, jax.random.PRNGKey(0), lambda e: e @ w_cls, loss_cls)
    assert np.isfinite(float(l)) and float(l) > 0


def test_cum_accumulation_and_reset():
    s = _state()
    loss_cls = DetIIFLoss(weights=jnp.ones(C + 1))
    scores = jax.random.normal(jax.random.PRNGKey(0), (8, C + 1))
    labels = jnp.asarray([0, 0, 1, 2, 5, 5, 5, 3])
    s1 = fasa_accumulate_val(s, loss_cls, scores, labels)
    cl = np.asarray(s1.cum_labels)
    assert cl[0] == 2 and cl[5] == 3
    assert np.asarray(s1.cum_losses).sum() > 0
    s2 = fasa_reset_cums(s1)
    assert np.asarray(s2.cum_losses).sum() == 0


def test_dynamic_sampling_updates_probs():
    s = _state()
    rng = np.random.RandomState(0)
    s = s._replace(
        feature_mean=jnp.asarray(rng.randn(C, D), jnp.float32),
        feature_used=jnp.ones(C),
        cum_losses=jnp.asarray([10.0, 1.0, 1.0, 1.0, 1.0, 0.0]),
        cum_labels=jnp.asarray([10.0, 2.0, 2.0, 2.0, 2.0, 0.0]),
        cum_loss_t0=jnp.asarray([0.1, 0.9, 0.9, 0.9, 0.9, 0.0]),
    )
    s1 = fasa_dynamic_sampling(s)
    p0, p1 = np.asarray(s.prob_list), np.asarray(s1.prob_list)
    assert not np.allclose(p0, p1)       # probs moved
    assert np.asarray(s1.cum_losses).sum() == 0  # counters reset
    # t0 updated to normalized t1
    np.testing.assert_allclose(
        np.asarray(s1.cum_loss_t0),
        np.asarray(s.cum_losses) / np.asarray(s.cum_labels).sum(), rtol=1e-5)


def test_fasa_state_is_pytree_and_jittable():
    s = _state()

    @jax.jit
    def step(state, emb, labels, w):
        return fasa_update(state, emb, labels, w)

    out = step(s, jnp.ones((3, D)), jnp.asarray([0, 1, 2]), jnp.ones(3))
    assert isinstance(out, FasaState)


def test_detector_fasa_integration():
    from tests.test_detection import NUM_CLASSES, _demo_inputs
    from iif_tpu.detection import MaskRCNN
    from iif_tpu.detection.detector import DetTrainCfg, maskrcnn_loss

    model = MaskRCNN(num_classes=NUM_CLASSES, depth=18, frozen_stages=-1)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 128, 128, 3)), False)
    fasa = init_fasa_state(np.arange(1, NUM_CLASSES + 1) * 10, feat_dim=1024)
    loss_cls = DetIIFLoss(weights=jnp.ones(NUM_CLASSES + 1))
    cfg = DetTrainCfg(rpn_nms_pre=64, rpn_max_per_img=32,
                      rcnn_num_samples=16, num_mask_rois=4)
    batch = _demo_inputs()
    total, losses, aux = maskrcnn_loss(
        model, variables, batch, jax.random.PRNGKey(0), loss_cls, cfg,
        fasa_state=fasa, epoch=1)
    assert np.isfinite(float(total))
    new_fasa = aux["fasa_state"]
    assert float(new_fasa.feature_used.sum()) > 0  # stats got updated
