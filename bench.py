"""Throughput benchmark: ResNet-50 ImageNet-LT training step on real TPU.

Measures end-to-end images/sec/chip of the full jitted train step (device-
side augmentation + fwd + bwd + SGD update, bf16 compute) with the IIF
criterion — the rebuild's flagship workload (BASELINE.json configs[1]).

Baseline: the reference publishes no classification throughput
(`classification/train.py:46-47` is a meter only); ~400 img/s is the
commonly-reported fp32 ResNet-50 V100 training throughput, used here as the
per-chip GPU reference so ``vs_baseline`` tracks the >=2x north star.

Prints ONE JSON line.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V100_RESNET50_IMG_S = 400.0  # per-chip GPU baseline (see module docstring)


def main():
    from iif_tpu.data.augment import imagenet_eval_transform, imagenet_train_augment
    from iif_tpu.data.lt_dataset import IMAGENET_MEAN, IMAGENET_STD
    from iif_tpu.engine import (ClassificationTrainer, build_lr_schedule,
                                build_optimizer)
    from iif_tpu.losses import get_criterion
    from iif_tpu.models import resnet50
    from iif_tpu.parallel import make_mesh, shard_batch

    batch = 256
    mesh = make_mesh()
    n_chips = mesh.devices.size
    # ImageNet-LT-like long-tailed counts (1000 classes, exp profile)
    counts = np.maximum((1280 * (0.01 ** (np.arange(1000) / 999.0))), 5).astype(int)
    criterion = get_criterion("iif", counts, iif_variant="raw")
    schedule = build_lr_schedule(0.1, steps_per_epoch=1000, epochs=90,
                                 milestones=[60, 80])
    tx = build_optimizer("sgd", schedule, momentum=0.9, weight_decay=1e-4)
    trainer = ClassificationTrainer(
        model=resnet50(num_classes=1000),
        criterion=criterion, tx=tx, mesh=mesh,
        train_augment=lambda k, x: imagenet_train_augment(
            k, x, IMAGENET_MEAN, IMAGENET_STD),
        eval_transform=lambda x: imagenet_eval_transform(
            x, IMAGENET_MEAN, IMAGENET_STD),
        num_classes=1000, compute_dtype=jnp.bfloat16)
    state = trainer.init_state((224, 224, 3))

    rng = np.random.RandomState(0)
    host_batch = {
        "image": rng.randint(0, 256, size=(batch, 256, 256, 3), dtype=np.uint8),
        "label": rng.randint(0, 1000, size=(batch,)),
    }
    gbatch = shard_batch(host_batch, mesh)

    # warmup / compile. NOTE: jax.block_until_ready does not actually block
    # on the axon tunnel backend — a host readback of a value that depends
    # on the full computation is the only honest sync. The state chain
    # makes the steps sequential, so reading the final loss times them all.
    for _ in range(3):
        state, metrics = trainer._train_step(state, gbatch)
    _ = float(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer._train_step(state, gbatch)
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0

    img_s = batch * iters / dt
    img_s_chip = img_s / n_chips
    print(json.dumps({
        "metric": "resnet50_imagenet_lt_train_images_per_sec_per_chip",
        "value": round(img_s_chip, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s_chip / V100_RESNET50_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
