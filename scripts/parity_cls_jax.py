"""iif_tpu side of the cross-framework BN-matched training-parity
experiment (pair of scripts/parity_cls_torch.py; orchestrated by
scripts/run_bn_parity.sh).

Matches the torch run 1:1: same .npz corpus, per-image flip p=0.5 only,
same normalize, resnet20, IIF 'raw' margins, SGD 0.02/0.9/1e-4 with the
same step schedule, f32 compute, batch 128. ``--norm`` selects the BN
statistics scope: 'bn' = full-batch (what single-process torch
computes), 'bn@G' = G local groups (per-GPU dynamics). Writes per-epoch
metrics to --out (JSON lines, same schema as the torch side).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--milestones", type=int, nargs="+", default=[20, 25])
    ap.add_argument("--norm", default="bn",
                    help="'bn' (global/sync) or 'bn@G' (local groups)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from iif_tpu.data import Loader, eval_batches
    from iif_tpu.engine import (ClassificationTrainer, build_lr_schedule,
                                build_optimizer)
    from iif_tpu.losses import get_criterion
    from iif_tpu.models import build_classifier
    from iif_tpu.parallel import make_mesh

    d = np.load(args.data)
    x_tr = d["x_train"].astype(np.float32)
    y_tr = d["y_train"].astype(np.int64)
    x_ev = d["x_eval"].astype(np.float32)
    y_ev = d["y_eval"].astype(np.int64)
    mean = jnp.asarray(d["mean"])
    std = jnp.asarray(d["std"])
    counts = np.bincount(y_tr, minlength=int(y_tr.max()) + 1)
    ncls = len(counts)
    low_shot = counts <= np.percentile(counts, 30)

    def train_aug(key, x):
        # per-image flip p=0.5, then normalize — the torch run's exact
        # augmentation (flip-only protocol)
        flips = jax.random.bernoulli(key, 0.5, (x.shape[0],))
        x = jnp.where(flips[:, None, None, None], x[:, :, ::-1, :], x)
        return (x - mean) / std

    def eval_tf(x):
        return (x - mean) / std

    mesh = make_mesh()
    loader = Loader(x_tr, y_tr, args.batch, sampler="random",
                    seed=args.seed, prefetch=0, drop_last=True)
    criterion = get_criterion("iif", counts, iif_variant="raw")
    schedule = build_lr_schedule(args.lr, len(loader), args.epochs,
                                 milestones=args.milestones)
    tx = build_optimizer("sgd", schedule, momentum=0.9, weight_decay=1e-4)
    trainer = ClassificationTrainer(
        model=build_classifier("resnet20", ncls, None, norm=args.norm),
        criterion=criterion, tx=tx, mesh=mesh,
        train_augment=train_aug, eval_transform=eval_tf,
        num_classes=ncls, compute_dtype=jnp.float32, seed=args.seed)
    state = trainer.init_state((32, 32, 3), seed=args.seed)

    out_f = open(args.out, "w")
    for ep in range(args.epochs):
        state, logger = trainer.train_one_epoch(
            state, loader, ep, print_freq=0, print_fn=lambda *a: None)
        res = trainer.evaluate(
            state, eval_batches(x_ev, y_ev, 256),
            print_fn=lambda *a: None)
        preds, labels = res["preds"], res["labels"]
        ls = low_shot[labels]
        rec = {"epoch": ep,
               "train_loss": float(logger.meters["loss"].global_avg),
               "top1": float(res["acc1"]),
               "low_shot": float((preds[ls] == labels[ls]).mean())
               if ls.any() else float("nan")}
        print(json.dumps(rec), flush=True)
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()


if __name__ == "__main__":
    main()
