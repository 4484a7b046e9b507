"""Torch side of the cross-framework BN-matched training-parity
experiment (VERDICT round-4 item 1).

A self-contained CPU-torch trainer with the REFERENCE's training
semantics (classification/train.py + resnet_cifar.py behavior,
re-implemented from the architectural spec — option-A-shortcut
ResNet-s, BN momentum 0.1/eps 1e-5, kaiming-normal convs, per-image
flip p=0.5, SGD momentum 0.9, step decay, IIF 'raw' margins) on the
same synthetic LT corpus the JAX side consumes (shared .npz written by
scripts/run_bn_parity.sh). No reference code is imported or copied; the
IIF loss math here is the same formula our losses/iif.py is
golden-tested against.

Single-process torch => BN statistics span the full batch, which is
exactly what iif_tpu's ``--sync-bn`` (norm='bn') computes; the paired
JAX run must therefore match when BN scopes are matched, and diverge
when it uses a different scope — that is the experiment.

Writes per-epoch metrics to --out (JSON lines).
"""
from __future__ import annotations

import argparse
import json

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class Block(nn.Module):
    def __init__(self, cin, planes, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.needs_short = stride != 1 or cin != planes
        self.planes = planes

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.needs_short:
            # option-A: stride-2 subsample + zero-pad channels
            s = x[:, :, ::2, ::2]
            pad = self.planes // 4
            s = F.pad(s, (0, 0, 0, 0, pad, pad))
        else:
            s = x
        return F.relu(out + s)


class ResNet20(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 16, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(16)
        layers = []
        cin = 16
        for planes, stride in ((16, 1), (32, 2), (64, 2)):
            for i in range(3):
                layers.append(Block(cin, planes, stride if i == 0 else 1))
                cin = planes
        self.layers = nn.Sequential(*layers)
        self.fc = nn.Linear(64, num_classes)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, nonlinearity="relu")

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.layers(x)
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def iif_weights(counts):
    # 'raw' variant: log(N / n_c) (reference custom.py IIFLoss)
    counts = np.asarray(counts, np.float64)
    return np.log(counts.sum() / counts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, help=".npz corpus")
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--milestones", type=int, nargs="+", default=[20, 25])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    torch.manual_seed(args.seed)
    d = np.load(args.data)
    x_tr = d["x_train"].astype(np.float32)     # (N, 32, 32, 3) in [0,1]
    y_tr = d["y_train"].astype(np.int64)
    x_ev = d["x_eval"].astype(np.float32)
    y_ev = d["y_eval"].astype(np.int64)
    mean = d["mean"].astype(np.float32)
    std = d["std"].astype(np.float32)
    counts = np.bincount(y_tr, minlength=int(y_tr.max()) + 1)
    ncls = len(counts)
    low_shot = counts <= np.percentile(counts, 30)

    model = ResNet20(ncls)
    w = torch.tensor(iif_weights(counts), dtype=torch.float32)
    opt = torch.optim.SGD(model.parameters(), lr=args.lr, momentum=0.9,
                          weight_decay=1e-4)
    sched = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=args.milestones, gamma=0.1)
    rng = np.random.RandomState(args.seed)
    n = len(x_tr)
    out_f = open(args.out, "w")
    for ep in range(args.epochs):
        model.train()
        order = rng.permutation(n)
        tot, nb = 0.0, 0
        for i in range(0, n - args.batch + 1, args.batch):
            idx = order[i:i + args.batch]
            xb = x_tr[idx].copy()
            flips = rng.rand(len(idx)) < 0.5        # per-image flip
            xb[flips] = xb[flips, :, ::-1]
            xb = (xb - mean) / std
            xb = torch.tensor(np.ascontiguousarray(
                xb.transpose(0, 3, 1, 2)))
            yb = torch.tensor(y_tr[idx])
            logits = model(xb) * w[None, :]         # IIF margins
            loss = F.cross_entropy(logits, yb)
            opt.zero_grad()
            loss.backward()
            opt.step()
            tot += float(loss)
            nb += 1
        sched.step()
        model.eval()
        with torch.no_grad():
            preds = []
            for i in range(0, len(x_ev), 256):
                xb = (x_ev[i:i + 256] - mean) / std
                xb = torch.tensor(np.ascontiguousarray(
                    xb.transpose(0, 3, 1, 2)))
                # inference-time IIF margins — the reference applies
                # criterion(output, infer=True) at eval (train.py:104-105)
                preds.append((model(xb) * w[None, :]).argmax(1).numpy())
            preds = np.concatenate(preds)
        acc = float((preds == y_ev).mean())
        ls_mask = low_shot[y_ev]
        ls_acc = float((preds[ls_mask] == y_ev[ls_mask]).mean()) \
            if ls_mask.any() else float("nan")
        rec = {"epoch": ep, "train_loss": tot / max(nb, 1),
               "top1": acc * 100, "low_shot": ls_acc}
        print(json.dumps(rec), flush=True)
        out_f.write(json.dumps(rec) + "\n")
        out_f.flush()


if __name__ == "__main__":
    main()
