"""Classification training CLI — TPU-native rebuild of
``classification/train.py`` (flags mirrored from ``get_args_parser``,
``train.py:288-392``).

Usage::

    python -m iif_tpu.cli.train --dset_name cifar100 --model resnet32 \
        --classif iif --iif raw --imb_factor 0.01 --epochs 200 \
        --data-path /path/to/cifar --output-dir runs/c100_iif
"""
from __future__ import annotations

import argparse
import datetime
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def get_args_parser(add_help: bool = True) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="IIF-TPU Classification Training", add_help=add_help)
    # data
    parser.add_argument("--data-path", default="./datasets", help="dataset root")
    parser.add_argument("--dset_name", default="cifar100",
                        help="ImageNet|imagenet_lt|inat18|places_lt|cifar10|cifar100|synthetic")
    parser.add_argument("--rand_number", default=0, type=int,
                        help="fix random number for data sampling")
    parser.add_argument("--imb_type", default="exp", type=str)
    parser.add_argument("--imb_factor", default=0.01, type=float)
    parser.add_argument("--sampler", default="random", type=str,
                        help="random|upsampling|downsampling")
    parser.add_argument("--cache-dataset", dest="cache_dataset",
                        action="store_true")
    parser.add_argument("--train-txt", default=None,
                        help="txt list for LT datasets (overrides default path)")
    parser.add_argument("--eval-txt", default=None)
    # model
    parser.add_argument("--model", default="resnet32")
    parser.add_argument("--classif_norm", default=None, type=str,
                        help="{None,norm,cosine,lr_cosine}")
    parser.add_argument("--pretrained", default=None, type=str,
                        help="checkpoint dir to ingest backbone weights from")
    # loss
    parser.add_argument("--classif", default="ce", type=str,
                        help="iif|bce|focal_loss|ce")
    parser.add_argument("--iif", default="raw", type=str,
                        help="raw|smooth|rel|normit|gombit|base2|base10")
    parser.add_argument("--iif_norm", default=0, type=int)
    parser.add_argument("--gamma", default=0.0, type=float)
    parser.add_argument("--alpha", default=None, type=float)
    parser.add_argument("--reduction", default="mean", type=str)
    parser.add_argument("--deffered", action="store_true",
                        help="deferred re-weighting (N/n_c class weights)")
    parser.add_argument("--mixup", default=None, type=float)
    # optimization
    parser.add_argument("-b", "--batch-size", default=32, type=int,
                        help="GLOBAL batch size")
    parser.add_argument("--epochs", default=400, type=int)
    parser.add_argument("-j", "--workers", default=4, type=int,
                        help="host prefetch depth (loader threads)")
    parser.add_argument("--opt", default="sgd", type=str)
    parser.add_argument("--lr", default=0.1, type=float)
    parser.add_argument("--momentum", default=0.9, type=float)
    parser.add_argument("--wd", "--weight-decay", default=1e-4, type=float,
                        dest="weight_decay")
    parser.add_argument("--milestones", nargs="+", default=[360, 380], type=int)
    parser.add_argument("--lr-gamma", default=0.1, type=float)
    parser.add_argument("--cosine_scheduler", action="store_true")
    parser.add_argument("--decoup", action="store_true",
                        help="freeze all but the classifier head")
    # augmentation
    parser.add_argument("--auto-augment", default=None,
                        help="cifar|imagenet|randaugment")
    parser.add_argument("--random-erase", default=0.0, type=float)
    # run control
    parser.add_argument("--print-freq", default=100, type=int)
    parser.add_argument("--output-dir", default=".", type=str)
    parser.add_argument("--resume", default="", type=str)
    parser.add_argument("--load_from", default="", type=str)
    parser.add_argument("--start-epoch", default=0, type=int)
    parser.add_argument("--test-only", dest="test_only", action="store_true")
    parser.add_argument("--record-result", dest="record_result",
                        action="store_true")
    parser.add_argument("--seed", default=0, type=int)
    # precision (bf16 replaces apex AMP)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--fp32", dest="bf16", action="store_false")
    # distributed (kept for CLI parity; JAX SPMD needs no dist-url plumbing)
    parser.add_argument("--world-size", default=1, type=int)
    parser.add_argument("--dist-url", default="env://")
    parser.add_argument("--sync-bn", dest="sync_bn", action="store_true",
                        help="force global-batch (sync) BN statistics; "
                        "default is the reference's per-device local BN "
                        "(one stats group per data-parallel device)")
    parser.add_argument("--bn-groups", default=0, type=int,
                        help="local-BN group count along the batch axis; "
                        "0 = auto (#data-parallel devices; 1 device => "
                        "global). Overrides --sync-bn when > 1.")
    return parser


def build_data(args):
    """Dataset dispatch (reference ``initialisers.py:51-112``)."""
    from iif_tpu.data import ImbalancedArrays, load_cifar, make_synthetic_cifar
    from iif_tpu.data.lt_dataset import LTDataset, LTDatasetEval

    name = args.dset_name
    if name in ("cifar10", "cifar100", "synthetic"):
        cls_num = 10 if name == "cifar10" else 100
        if name == "synthetic":
            cls_num = 100
            data, targets = make_synthetic_cifar(500, cls_num, seed=args.rand_number)
            eval_data, eval_targets = make_synthetic_cifar(100, cls_num, seed=999)
        else:
            data, targets = load_cifar(args.data_path, name, train=True)
            eval_data, eval_targets = load_cifar(args.data_path, name, train=False)
        train_ds = ImbalancedArrays(data, targets, cls_num, args.imb_type,
                                    args.imb_factor, args.rand_number)
        return dict(train=train_ds, train_data=train_ds.data,
                    train_targets=train_ds.targets,
                    eval_data=eval_data, eval_targets=eval_targets,
                    num_classes=cls_num, kind="cifar")
    if name in ("imagenet_lt", "places_lt", "inat18"):
        defaults = {
            "imagenet_lt": ("ImageNet_LT_train.txt", "ImageNet_LT_test.txt", 1000),
            "places_lt": ("Places_LT_train.txt", "Places_LT_test.txt", 365),
            "inat18": ("iNaturalist18_train.txt", "iNaturalist18_val.txt", 8142),
        }[name]
        train_txt = args.train_txt or os.path.join(args.data_path, defaults[0])
        eval_txt = args.eval_txt or os.path.join(args.data_path, defaults[1])
        train_ds = LTDataset(args.data_path, train_txt, defaults[2])
        eval_ds = LTDatasetEval(args.data_path, eval_txt, train_ds.class_map,
                                defaults[2])
        return dict(train=train_ds, train_data=train_ds,
                    train_targets=train_ds.targets,
                    eval_data=eval_ds, eval_targets=eval_ds.targets,
                    num_classes=defaults[2], kind="imagenet")
    raise ValueError(f"unknown dataset {name!r}")


def record_result(result: float, args, path: str) -> None:
    """Append run args + best acc to results.csv (reference
    ``train.py:27-35``)."""
    import csv

    row = dict(vars(args))
    row["acc"] = result
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            w.writeheader()
        w.writerow({k: str(v) for k, v in row.items()})


def main(args, qat=None):
    from iif_tpu.utils.compile_cache import enable as _enable_xla_cache
    _enable_xla_cache()

    from iif_tpu.data import Loader, eval_batches
    from iif_tpu.data.augment import (
        cifar_eval_transform, cifar_train_augment, imagenet_eval_transform,
        imagenet_train_augment)
    from iif_tpu.data.cifar_lt import CIFAR10_MEAN, CIFAR10_STD
    from iif_tpu.data.lt_dataset import (IMAGENET_MEAN, IMAGENET_STD,
                                         INAT18_MEAN, INAT18_STD)
    from iif_tpu.engine import (ClassificationTrainer, build_lr_schedule,
                                build_optimizer)
    from iif_tpu.engine.per_shot import shot_acc
    from iif_tpu.engine.schedules import classifier_mask
    from iif_tpu.losses import get_criterion
    from iif_tpu.models import build_classifier
    from iif_tpu.parallel import initialize_distributed, is_main_process, make_mesh
    from iif_tpu.utils.checkpoint import CheckpointManager, load_weights

    initialize_distributed()
    if args.world_size != 1 or args.dist_url != "env://":
        import warnings

        warnings.warn(
            "--world-size/--dist-url are accepted for reference-CLI "
            "parity but ignored: JAX discovers the process topology from "
            "its own runtime (JAX_COORDINATOR_ADDRESS/SLURM env; see "
            "iif_tpu/parallel/mesh.py). Process count in use: "
            f"{jax.process_count()}", RuntimeWarning)
    mesh = make_mesh()
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    print(args)

    d = build_data(args)
    num_classes = d["num_classes"]
    loader = Loader(d["train_data"], d["train_targets"], args.batch_size,
                    sampler=args.sampler, seed=args.seed,
                    prefetch=args.workers)
    criterion = get_criterion(
        args.classif, d["train"].get_cls_num_list(), iif_variant=args.iif,
        iif_norm=args.iif_norm, gamma=args.gamma, alpha=args.alpha,
        reduction=args.reduction, deferred=args.deffered)

    print("Creating model")
    # BN statistics scope. The reference trains with per-GPU local BN
    # (SyncBN is opt-in and unused in the published recipes:
    # classification/train.py:190-191); under SPMD jit the default
    # reduction is the global sharded batch, so we group the batch axis
    # to recover the reference's dynamics. auto => one group per
    # data-parallel device (1 device => global, identical to sync).
    from iif_tpu.parallel.mesh import DATA_AXIS

    dp = int(mesh.shape[DATA_AXIS])
    bn_groups = args.bn_groups if args.bn_groups > 0 else (
        1 if args.sync_bn else dp)
    if args.sync_bn and args.bn_groups > 1:
        print(f"--bn-groups {args.bn_groups} overrides --sync-bn")
    if bn_groups > 1 and args.batch_size % bn_groups:
        raise SystemExit(
            f"batch_size {args.batch_size} not divisible by bn_groups "
            f"{bn_groups}; pass --bn-groups explicitly")
    norm_spec = "bn" if bn_groups <= 1 else f"bn@{bn_groups}"
    if bn_groups > 1:
        print(f"BatchNorm: local stats over {bn_groups} batch groups "
              f"(per-device-BN semantics); --sync-bn forces global")
    model = build_classifier(args.model, num_classes, args.classif_norm,
                             norm=norm_spec)
    if d["kind"] == "cifar":
        mean, std = CIFAR10_MEAN, CIFAR10_STD
        use_policy = args.auto_augment == "cifar"
        use_oneof = args.auto_augment == "oneof"
        train_aug = lambda k, x: cifar_train_augment(
            k, x, mean, std, use_policy=use_policy, use_oneof=use_oneof,
            random_erase=args.random_erase)
        eval_tf = lambda x: cifar_eval_transform(x, mean, std)
        sample_shape = (32, 32, 3)
    else:
        if args.dset_name == "inat18":
            mean, std = INAT18_MEAN, INAT18_STD
            hue = 0.25
        else:
            mean, std = IMAGENET_MEAN, IMAGENET_STD
            hue = 0.0
        train_aug = lambda k, x: imagenet_train_augment(
            k, x, mean, std, hue=hue, auto_augment=args.auto_augment,
            random_erase=args.random_erase)
        eval_tf = lambda x: imagenet_eval_transform(x, mean, std)
        sample_shape = (224, 224, 3)

    schedule = build_lr_schedule(
        args.lr, len(loader), args.epochs, milestones=args.milestones,
        lr_gamma=args.lr_gamma, cosine=args.cosine_scheduler)

    tx = build_optimizer(args.opt, schedule, args.momentum, args.weight_decay)
    trainer = ClassificationTrainer(
        model=model, criterion=criterion, tx=tx, mesh=mesh,
        train_augment=train_aug, eval_transform=eval_tf,
        num_classes=num_classes, mixup_alpha=args.mixup,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        seed=args.seed, qat=qat)
    state = trainer.init_state(sample_shape, seed=args.seed)

    if args.decoup:
        # freeze backbone, re-init + train only the classifier head
        from iif_tpu.engine.schedules import reinit_classifier_head

        mask = classifier_mask(state.params)
        tx = build_optimizer(args.opt, schedule, args.momentum,
                             args.weight_decay, trainable_mask=mask)
        trainer.tx = tx
        new_params = reinit_classifier_head(state.params, seed=args.seed)
        state = state.replace(params=new_params,
                              opt_state=tx.init(new_params))

    mngr = CheckpointManager(os.path.join(args.output_dir, "checkpoints")) \
        if args.output_dir else None
    start_epoch = args.start_epoch
    if args.resume and mngr is not None:
        restored = mngr.restore(template=jax.device_get(
            {"state": state, "epoch": 0}))
        state = jax.device_put(restored["state"])
        start_epoch = int(restored["epoch"]) + 1
    if args.load_from:
        weights = load_weights(args.load_from)
        state = state.replace(params=jax.device_put(weights["state"]["params"]),
                              batch_stats=jax.device_put(
                                  weights["state"]["batch_stats"]))

    def _eval():
        batches = eval_batches(d["eval_data"], d["eval_targets"],
                               args.batch_size)
        if qat is not None and qat.enabled:
            return trainer.evaluate_quantized(state, batches)
        return trainer.evaluate(state, batches)

    if args.test_only:
        res = _eval()
        many, med, low = shot_acc(res["preds"], res["labels"],
                                  d["train_targets"])
        print(f"Many {many:.3f}  Median {med:.3f}  Low {low:.3f}")
        return res["acc1"]

    print("Start training")
    log_writer = None
    if args.output_dir and is_main_process():
        from iif_tpu.utils.logging import TrainLogWriter

        log_writer = TrainLogWriter(args.output_dir)
        log_writer.write_env_header(exp_name=f"{args.model}_{args.classif}",
                                    seed=args.seed)
    start_time = time.time()
    best_acc = 0.0
    for epoch in range(start_epoch, args.epochs):
        state, _ = trainer.train_one_epoch(state, loader, epoch,
                                           print_freq=args.print_freq,
                                           log_writer=log_writer)
        res = trainer.evaluate(
            state, eval_batches(d["eval_data"], d["eval_targets"],
                                args.batch_size))
        if log_writer is not None:
            log_writer.write({"mode": "val", "epoch": epoch + 1,
                              "acc1": res["acc1"], "acc5": res["acc5"]},
                             step=(epoch + 1) * len(loader))
        best_acc = max(best_acc, res["acc1"])
        if mngr is not None and is_main_process():
            mngr.save(epoch, {"state": jax.device_get(state), "epoch": epoch})

    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    print(f"Training time {total}")
    print("best acc is:", best_acc)
    if args.record_result and is_main_process():
        record_result(best_acc, args,
                      os.path.join(args.output_dir, "results.csv"))
    return best_acc


if __name__ == "__main__":
    main(get_args_parser().parse_args())
