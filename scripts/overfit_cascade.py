"""On-TPU cascade overfit validation (VERDICT round-2 item 4a).

Generates a synthetic COCO dataset on disk (bright-square objects, 2
categories), writes a smoke-scale config with the flagship cascade
recipe's shape (CascadeMaskRCNN, cos-norm heads, per-stage stds,
per-stage FASA, dynamic runner — ``configs/fasa/
fasa_iif_cascade_r101_rfs_cos_norm_2x.py`` semantics), trains for 30
epochs through the real CLI, then evals through the test CLI.

Target: bbox AP >= 0.8 (the MaskRCNN round-2 harness reached 0.825).

Usage:  python scripts/overfit_cascade.py [--root /tmp/cascade_overfit]
        [--epochs 30] [--grad-accum 1]
"""
import argparse
import json
import os
import subprocess
import sys

import numpy as np


def make_dataset(root, n_imgs=8, size=(96, 128), n_cats=2,
                 obj_range=(20, 32)):
    """``obj_range``: object side-length range. The default 20-32 px is a
    "small" object at this canvas; set-prediction heads (DETR) are
    famously slow on small objects, so their harness passes a larger
    range."""
    import cv2

    h, w = size
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(0)
    images, anns = [], []
    aid = 1
    lo, hi = obj_range
    for i in range(n_imgs):
        img = rng.randint(0, 100, (h, w, 3), np.uint8)
        x1 = rng.randint(5, max(w - hi - 8, 6))
        y1 = rng.randint(5, max(h - hi - 8, 6))
        bw, bh = rng.randint(lo, hi), rng.randint(lo, hi)
        img[y1:y1 + bh, x1:x1 + bw] = 230
        cv2.imwrite(os.path.join(img_dir, f"{i}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        images.append({"id": i, "file_name": f"images/{i}.jpg",
                       "width": w, "height": h})
        anns.append({"id": aid, "image_id": i,
                     "category_id": 1 + i % n_cats,
                     "bbox": [int(x1), int(y1), int(bw), int(bh)],
                     "area": int(bw * bh), "iscrowd": 0,
                     "segmentation": [[x1, y1, x1 + bw, y1, x1 + bw,
                                       y1 + bh, x1, y1 + bh]]})
        aid += 1
    ann = {"categories": [
               {"id": c + 1, "name": f"square{c}",
                "image_count": max(1, n_imgs // n_cats)}
               for c in range(n_cats)],
           "images": images, "annotations": anns}
    ann_path = os.path.join(root, "ann.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    return ann_path


def write_config(root, ann_path, epochs, grad_accum, batch):
    cfg = f'''
model = dict(type="CascadeMaskRCNN", depth=18, num_classes=2,
             with_mask=True, frozen_stages=-1, cls_predictor="normed",
             mask_predictor="normed", reg_class_agnostic=False,
             stage_stds=[[0.1, 0.1, 0.2, 0.2], [0.05, 0.05, 0.1, 0.1],
                         [0.33, 0.33, 0.067, 0.067]])
loss_cls = dict(type="DetIIFLoss", variant="raw", path=None)
train_cfg = dict(rpn_nms_pre=256, rpn_max_per_img=128,
                 rcnn_num_samples=64, num_mask_rois=16)
test_cfg = dict(rpn_nms_pre=256, rpn_max_per_img=128, score_thr=0.0,
                max_per_img=5)
data = dict(
    samples_per_gpu={batch},
    grad_accum={grad_accum},
    train=dict(type="CocoDataset", ann_file="{ann_path}",
               img_prefix="{root}", oversample_thr=1e-3),
    val=dict(type="CocoDataset", ann_file="{ann_path}",
             img_prefix="{root}"),
    test=dict(type="CocoDataset", ann_file="{ann_path}",
              img_prefix="{root}"),
)
pipeline = dict(canvas=(96, 128), scales=[(128, 96)], max_gt=4)
optimizer = dict(type="sgd", lr=0.01, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(milestones=[{epochs - 5}], gamma=0.1, warmup_iters=5)
fasa_cfg = dict(decay_ratio=0.1, loss_aug_weight=0.1, dynamic_up=1.1,
                dynamic_down=0.9)
runner = dict(type="EpochBasedDynamicRunner", max_epochs={epochs})
checkpoint_config = dict(interval={epochs})
log_config = dict(interval=5)
seed = 0
'''
    path = os.path.join(root, "cascade_overfit_cfg.py")
    with open(path, "w") as f:
        f.write(cfg)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/cascade_overfit")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--grad-accum", type=int, default=1)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    ann = make_dataset(args.root)
    cfg = write_config(args.root, ann, args.epochs, args.grad_accum,
                       args.batch)
    work = os.path.join(args.root, "work")

    r = subprocess.run(
        [sys.executable, "-m", "iif_tpu.cli.train_det", cfg,
         "--work-dir", work], cwd="/root/repo")
    if r.returncode != 0:
        sys.exit(r.returncode)

    r2 = subprocess.run(
        [sys.executable, "-m", "iif_tpu.cli.test_det", cfg,
         os.path.join(work, "checkpoints"), "--eval", "bbox", "segm"],
        cwd="/root/repo")
    sys.exit(r2.returncode)


if __name__ == "__main__":
    main()
