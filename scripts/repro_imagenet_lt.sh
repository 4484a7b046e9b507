#!/usr/bin/env bash
# North-star reproduction: ImageNet-LT SE-ResNet50 + IIF -> 55.8 top-1
# (reference README abstract; recipe from classification/README.md
# "ImageNet-LT": 4x V100, b64/GPU = global 256, two stages + IIF
# post-process). See docs/repro.md for the flag-by-flag mapping.
#
# Usage (data-equipped environment):
#   DATA_ROOT=/path/to/ILSVRC/Data/CLS-LOC ./scripts/repro_imagenet_lt.sh [outdir]
# needs the ImageNet_LT_{train,test}.txt split lists next to this repo
# (iif_tpu/data/lt_dataset.py documents the format) or under $LT_LISTS.
#
# CI smoke (no real data): IIF_SMOKE=1 ./scripts/repro_imagenet_lt.sh
# runs both stages + the post-process eval on synthetic CIFAR-LT so the
# exact invocation cannot rot.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-experiments/repro_imagenet_lt}
mkdir -p "$OUT"

if [ "${IIF_SMOKE:-0}" = "1" ]; then
  # same two-stage flow, tiny synthetic stand-in (dataset plumbing is
  # identical; only --dset_name/--model/sizes differ)
  COMMON=(--dset_name synthetic --imb_factor 0.1 --model resnet20 -b 32
          --epochs 1 --workers 0 --fp32)
  python -m iif_tpu.cli.train "${COMMON[@]}" \
    --output-dir "$OUT/stage1" --lr 0.2 --cosine_scheduler \
    --reduction mean --classif_norm cosine --mixup 0.2
  python -m iif_tpu.cli.train "${COMMON[@]}" \
    --output-dir "$OUT/stage2" --lr 0.00002 \
    --classif_norm cosine --mixup 0.2 \
    --load_from "$OUT/stage1/checkpoints" \
    --classif iif --decoup --iif smooth
  python -m iif_tpu.cli.train "${COMMON[@]}" \
    --output-dir "$OUT/post" --classif_norm cosine \
    --load_from "$OUT/stage1/checkpoints" \
    --classif iif --iif smooth --test-only
  echo "IIF_SMOKE repro_imagenet_lt: OK"
  exit 0
fi

: "${DATA_ROOT:?set DATA_ROOT to the ImageNet CLS-LOC root}"
LT_LISTS=${LT_LISTS:-$DATA_ROOT}

# Stage 1 — representation learning (reference README.md:67): 200
# epochs CE+mixup. --bn-groups 4 pins the per-GPU-BN statistics scope of
# the reference's 4-GPU run regardless of the chip count here.
python -m iif_tpu.cli.train \
  --dset_name imagenet_lt --data-path "$DATA_ROOT" \
  --train-txt "$LT_LISTS/ImageNet_LT_train.txt" \
  --eval-txt "$LT_LISTS/ImageNet_LT_test.txt" \
  --model se_resnet50 --output-dir "$OUT/stage1" \
  -b 256 --bn-groups 4 --lr 0.2 --epochs 200 --cosine_scheduler \
  --reduction mean --classif_norm cosine --mixup 0.2 \
  --auto-augment imagenet --momentum 0.9 --wd 1e-4 --seed 0

# Stage 2 — decoupled classifier learning with IIF (README.md:72): 5
# epochs, lr 2e-5, backbone frozen, head re-initialized.
python -m iif_tpu.cli.train \
  --dset_name imagenet_lt --data-path "$DATA_ROOT" \
  --train-txt "$LT_LISTS/ImageNet_LT_train.txt" \
  --eval-txt "$LT_LISTS/ImageNet_LT_test.txt" \
  --model se_resnet50 --output-dir "$OUT/stage2" \
  -b 256 --bn-groups 4 --lr 0.00002 --epochs 5 \
  --reduction mean --classif_norm cosine --mixup 0.2 \
  --auto-augment imagenet \
  --load_from "$OUT/stage1/checkpoints" \
  --classif iif --decoup --iif smooth --seed 0

# Post-process IIF eval (README.md:77): test-only with the smooth-IIF
# margins applied to the stage-1 weights; 55.8 is the published top-1.
python -m iif_tpu.cli.train \
  --dset_name imagenet_lt --data-path "$DATA_ROOT" \
  --train-txt "$LT_LISTS/ImageNet_LT_train.txt" \
  --eval-txt "$LT_LISTS/ImageNet_LT_test.txt" \
  --model se_resnet50 --output-dir "$OUT/post" \
  -b 256 --classif_norm cosine \
  --load_from "$OUT/stage1/checkpoints" \
  --classif iif --iif smooth --test-only --record-result \
  | tee "$OUT/post/eval.log"

# expected-metric gate: top-1 55.8 +/- 0.5 (reference README abstract)
python - "$OUT/post/eval.log" <<'PY'
import re, sys
txt = open(sys.argv[1]).read()
m = re.findall(r"Acc@1[^0-9]*([0-9.]+)", txt)
acc = float(m[-1]) if m else float("nan")
ok = abs(acc - 55.8) <= 0.5
print(f"ImageNet-LT top-1 = {acc:.1f} (target 55.8 +/- 0.5): "
      + ("PASS" if ok else "FAIL"))
sys.exit(0 if ok else 1)
PY
