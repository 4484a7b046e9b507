"""Sequential on-TPU learning validation across detector families.

Runs ``overfit_retinanet.py``'s harness (synthetic bright-square COCO
dataset, smoke-scale config, real train CLI -> real test CLI) for each
requested family, captures the final bbox AP from the eval output, and
writes a summary table to ``--out`` (markdown) so the results are
recordable in docs/validation.md.

Families already TPU-validated elsewhere (MaskRCNN/Cascade overfit
harnesses) are not re-run here.

Usage:
  python scripts/validate_families.py [--models ATSS,GFL,...]
  python scripts/validate_families.py --models all --epochs 30
"""
import argparse
import os
import re
import subprocess
import sys
import time

ALL = ["RetinaNet", "FCOS", "ATSS", "GFL", "FSAF", "FOVEA", "YOLOF",
       "RepPointsDetector", "VFNet", "AutoAssign", "NASFCOS", "PAA",
       "YOLOX", "YOLOV3", "CenterNet", "DETR", "SparseRCNN",
       "DeformableDETR", "FreeAnchor", "GARetinaNet"]
# two-stage exotic families route to the overfit_twostage harness
TWO_STAGE = ["FasterRCNN", "MaskScoringRCNN", "HybridTaskCascade",
             "SCNet", "PointRend", "GridRCNN", "TridentFasterRCNN",
             "FasterRCNNC4", "DetectoRS", "CascadeRPN"]


# Family-specific harness settings (root-caused round 5):
# - DETR: set prediction learns the 8-image corpus perfectly but NMS-free
#   duplicate queries are counted as FPs at this scale (max_per_img=1 in
#   write_config), and flip aug doubles the effective corpus a 20-query
#   head cannot amortize here -> train without flip, longer schedule.
# - YOLOF: single C5 level (stride 32) has ~12 anchor positions at this
#   canvas; 20-32 px objects fail the 0.15 pos-IoU pair filter -> the
#   harness uses the 48-64 px object range (overfit_retinanet.py) and a
#   longer schedule.
SLOW_CONVERGERS = {"DETR": 400, "YOLOF": 600, "DeformableDETR": 400}
NOFLIP = {"DETR", "DeformableDETR"}


def run_one(model, epochs, batch):
    root = f"/tmp/family_overfit/{model}"
    # stale state from a previous sweep (old checkpoints/datasets) can
    # poison the eval — always start clean
    import shutil
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    script = ("scripts/overfit_twostage.py" if model in TWO_STAGE
              else "scripts/overfit_retinanet.py")
    epochs = max(epochs, SLOW_CONVERGERS.get(model, 0))
    extra = ["--noflip"] if model in NOFLIP else []
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, script, "--model", model,
         "--root", root, "--epochs", str(epochs), "--batch", str(batch)]
        + extra,
        cwd="/root/repo", capture_output=True, text=True, timeout=3600)
    dt = time.time() - t0
    out = p.stdout + p.stderr
    # the test CLI prints: bbox {'AP': 0.825, ...} (proposal-only
    # families print AR@100 instead)
    ap = None
    m_ = re.search(r"bbox \{[^}]*'AP': ([0-9.eE+-]+)", out)
    if m_ is None:
        m_ = re.search(r"'AR@100': ([0-9.eE+-]+)", out)
    if m_:
        ap = float(m_.group(1))
    return {"model": model, "ok": p.returncode == 0, "bbox_ap": ap,
            "wall_s": round(dt, 1),
            "tail": out[-1200:] if p.returncode != 0 else ""}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="all")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="/tmp/family_overfit/summary.md")
    args = ap.parse_args()
    models = (ALL if args.models == "all"
              else TWO_STAGE if args.models == "twostage"
              else args.models.split(","))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    rows = []
    for m in models:
        try:
            r = run_one(m, args.epochs, args.batch)
        except subprocess.TimeoutExpired:
            r = {"model": m, "ok": False, "bbox_ap": None,
                 "wall_s": 3600.0, "tail": "TIMEOUT"}
        rows.append(r)
        print(f"{m}: ok={r['ok']} bbox_ap={r['bbox_ap']} "
              f"({r['wall_s']}s)", flush=True)
        if not r["ok"]:
            print(r["tail"], flush=True)
        with open(args.out, "w") as f:
            f.write("| family | bbox AP (30-ep overfit) | wall (s) |\n"
                    "|---|---|---|\n")
            for r2 in rows:
                ap_s = ("%.3f" % r2["bbox_ap"]
                        if r2["bbox_ap"] is not None else
                        ("FAIL" if not r2["ok"] else "n/a"))
                f.write(f"| {r2['model']} | {ap_s} | {r2['wall_s']} |\n")


if __name__ == "__main__":
    main()
