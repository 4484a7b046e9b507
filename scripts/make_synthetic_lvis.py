#!/usr/bin/env python
"""Emit a synthetic LVIS-v1-layout corpus for repro-script smoke runs
(scripts/repro_lvis_iif.sh under IIF_SMOKE=1): the CI guard that keeps
the exact north-star invocation from rotting when no real data can enter
the environment. Prints the data root on stdout."""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/iif_smoke_lvis")
    ap.add_argument("--n-imgs", type=int, default=8)
    ap.add_argument("--n-cats", type=int, default=24)
    args = ap.parse_args()

    from bench import _make_e2e_dataset

    root = args.out
    if os.path.isdir(root):
        shutil.rmtree(root)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    ann = _make_e2e_dataset(root, n_imgs=args.n_imgs, n_cats=args.n_cats)
    with open(ann) as f:
        d = json.load(f)
    for split in ("train", "val"):
        with open(os.path.join(root, "annotations",
                               f"lvis_v1_{split}.json"), "w") as f:
            json.dump(d, f)
    os.remove(ann)
    print(root)


if __name__ == "__main__":
    main()
