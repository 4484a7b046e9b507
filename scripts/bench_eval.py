"""Benchmark DetEvaluator at production scale (SURVEY §7 risk (f):
"lvis-api eval throughput on 300 dets/img x 19.8k val images").

Generates a synthetic COCO-style dataset (no files), times
``DetEvaluator.evaluate`` for bbox (and optionally segm), and reports
images/sec so runs at different scales can be compared. Run CPU-only:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/bench_eval.py --imgs 1000 --cats 80 --dets 40
"""
from __future__ import annotations

import argparse
import time

import numpy as np

from iif_tpu.detection.evaluation import DetEvaluator


def make_dataset(n_imgs: int, n_cats: int, gt_per_img: int,
                 det_per_img: int, seed: int = 0, lvis: bool = False):
    rng = np.random.RandomState(seed)
    cats = list(range(1, n_cats + 1))
    images, gt_anns, dets = [], [], []
    for iid in range(1, n_imgs + 1):
        h, w = 480, 640
        im = {"id": iid, "height": h, "width": w}
        present = set()
        for _ in range(gt_per_img):
            cat = int(rng.choice(cats))
            bw = float(np.exp(rng.uniform(np.log(8), np.log(200))))
            bh = float(np.exp(rng.uniform(np.log(8), np.log(200))))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            gt_anns.append({"image_id": iid, "category_id": cat,
                            "bbox": [x, y, bw, bh], "area": bw * bh,
                            "iscrowd": int(rng.rand() < 0.02)})
            present.add(cat)
        # detections: jittered copies of gts + random noise boxes
        base = [g for g in gt_anns if g["image_id"] == iid]
        for k in range(det_per_img):
            if base and rng.rand() < 0.7:
                g = base[rng.randint(len(base))]
                x, y, bw, bh = g["bbox"]
                s = rng.uniform(0.0, 0.4)
                box = [x + rng.uniform(-s, s) * bw, y + rng.uniform(-s, s) * bh,
                       bw * rng.uniform(1 - s, 1 + s),
                       bh * rng.uniform(1 - s, 1 + s)]
                cat = g["category_id"] if rng.rand() < 0.8 \
                    else int(rng.choice(cats))
            else:
                bw = float(rng.uniform(8, 200))
                bh = float(rng.uniform(8, 200))
                box = [float(rng.uniform(0, w - bw)),
                       float(rng.uniform(0, h - bh)), bw, bh]
                cat = int(rng.choice(cats))
            dets.append({"image_id": iid, "category_id": cat,
                         "bbox": box, "score": float(rng.rand())})
        if lvis:
            im["neg_category_ids"] = [c for c in cats
                                      if c not in present][:5]
            im["not_exhaustive_category_ids"] = []
        images.append(im)
    counts = {c: n_imgs for c in cats}
    return images, gt_anns, dets, cats, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imgs", type=int, default=1000)
    ap.add_argument("--cats", type=int, default=80)
    ap.add_argument("--gts", type=int, default=8)
    ap.add_argument("--dets", type=int, default=40)
    ap.add_argument("--lvis", action="store_true")
    ap.add_argument("--max-dets", type=int, default=100)
    args = ap.parse_args()

    images, gt_anns, dets, cats, counts = make_dataset(
        args.imgs, args.cats, args.gts, args.dets, lvis=args.lvis)
    ev = DetEvaluator(images, gt_anns, cats, lvis=args.lvis,
                      cat_image_counts=counts, max_dets=args.max_dets)
    t0 = time.perf_counter()
    out = ev.evaluate(dets, iou_type="bbox")
    dt = time.perf_counter() - t0
    print(f"bbox eval: {dt:.2f}s for {args.imgs} imgs x {args.cats} cats "
          f"x {args.dets} dets/img -> {args.imgs / dt:.1f} img/s")
    print({k: round(v, 4) for k, v in out.items()})


if __name__ == "__main__":
    main()
