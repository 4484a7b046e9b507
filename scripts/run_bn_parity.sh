#!/usr/bin/env bash
# Cross-framework BN-matched training parity (VERDICT round-4 item 1).
#
# Shared synthetic LT corpus (50 classes, exp imbalance) -> three runs:
#   torch  : reference-semantics CPU trainer (full-batch BN)
#   jax-bn : iif_tpu, norm='bn'   (full-batch BN — BN-MATCHED with torch)
#   jax-g4 : iif_tpu, norm='bn@4' (per-GPU-of-4 dynamics — the contrast)
# and a comparison gate: the BN-matched pair must agree on final top-1
# within seed noise while the contrast arm is allowed to differ.
#
# Usage: ./scripts/run_bn_parity.sh [outdir] [epochs]
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bn_parity}
EPOCHS=${2:-30}
mkdir -p "$OUT"
export JAX_PLATFORMS=${JAX_PLATFORMS:-cpu}
unset PALLAS_AXON_POOL_IPS || true

[ -s "$OUT/corpus.npz" ] || python - "$OUT/corpus.npz" <<'PY'
import sys
import numpy as np
from iif_tpu.data import make_synthetic_cifar
from iif_tpu.data.cifar_lt import CIFAR10_MEAN, CIFAR10_STD

NCLS = 50
x, y = make_synthetic_cifar(100, NCLS, seed=0)
# exp imbalance 0.1 over 50 classes
keep = []
for c in range(NCLS):
    idx = np.where(y == c)[0]
    n = max(5, int(100 * (0.1 ** (c / (NCLS - 1)))))
    keep.append(idx[:n])
keep = np.concatenate(keep)
rng = np.random.RandomState(0)
rng.shuffle(keep)
xe, ye = make_synthetic_cifar(20, NCLS, seed=777)
np.savez(sys.argv[1],
         x_train=(x[keep] / 255.0).astype(np.float32), y_train=y[keep],
         x_eval=(xe / 255.0).astype(np.float32), y_eval=ye,
         mean=np.asarray(CIFAR10_MEAN, np.float32),
         std=np.asarray(CIFAR10_STD, np.float32))
print(f"corpus: {len(keep)} train / {len(ye)} eval", file=sys.stderr)
PY

[ -s "$OUT/torch.jsonl" ] || python scripts/parity_cls_torch.py --data "$OUT/corpus.npz" \
  --out "$OUT/torch.jsonl" --epochs "$EPOCHS" | tail -1
[ -s "$OUT/jax_bn.jsonl" ] || python scripts/parity_cls_jax.py --data "$OUT/corpus.npz" \
  --out "$OUT/jax_bn.jsonl" --epochs "$EPOCHS" --norm bn | tail -1
[ -s "$OUT/jax_g4.jsonl" ] || python scripts/parity_cls_jax.py --data "$OUT/corpus.npz" \
  --out "$OUT/jax_g4.jsonl" --epochs "$EPOCHS" --norm bn@4 | tail -1

python - "$OUT" <<'PY'
import json, sys, os
out = sys.argv[1]
def final(name):
    recs = [json.loads(l) for l in open(os.path.join(out, name))]
    return recs[-1]
t, jb, jg = final("torch.jsonl"), final("jax_bn.jsonl"), final("jax_g4.jsonl")
print(f"final top-1:  torch {t['top1']:.1f}  jax(bn) {jb['top1']:.1f}  "
      f"jax(bn@4) {jg['top1']:.1f}")
print(f"final low-shot: torch {t['low_shot']:.3f}  jax(bn) "
      f"{jb['low_shot']:.3f}  jax(bn@4) {jg['low_shot']:.3f}")
gap = abs(t["top1"] - jb["top1"])
print(f"BN-matched gap: {gap:.1f} top-1 points "
      + ("(PASS <= 5.0)" if gap <= 5.0 else "(FAIL > 5.0)"))
sys.exit(0 if gap <= 5.0 else 1)
PY
