"""On-TPU detector-family overfit validation (every single-stage-CLI
family: RetinaNet / FCOS / ATSS / YOLOX / YOLOV3 / CenterNet / DETR /
GFL / FSAF / FOVEA / YOLOF / RepPoints / VFNet / SparseRCNN /
DeformableDETR / AutoAssign / NASFCOS / PAA).

Same harness as ``overfit_cascade.py``: synthetic bright-square COCO
dataset on disk, smoke-scale config, N epochs through the real train
CLI, eval through the test CLI. Validates that each family learns
end-to-end on the chip, not just in unit tests.

Usage:  python scripts/overfit_retinanet.py [--model RetinaNet|FCOS|
        ATSS|YOLOX|YOLOV3|CenterNet|DETR] [--root /tmp/retina_overfit]
        [--epochs 30]
"""
import argparse
import os
import subprocess
import sys

from overfit_cascade import make_dataset  # same synthetic dataset


def write_config(root, ann_path, epochs, batch, mtype, flip=0.5):
    extra = {
        "RetinaNet": "gamma=2.0, alpha=0.25",
        "FCOS": "gamma=2.0, alpha=0.25, center_sampling=False",
        "ATSS": "gamma=2.0, alpha=0.25",
        "GFL": "gamma=2.0, alpha=0.25",
        "FSAF": "gamma=2.0, alpha=0.25",
        "PAA": "gamma=2.0, alpha=0.25",
    }.get(mtype, "")
    model_extra = {
        "YOLOX": ', deepen=0.33, widen=0.5',
        "DETR": ', num_query=20',
        "CenterNet": ', norm_eval=False',
        "SparseRCNN": ', num_proposals=20, num_dii_stages=2',
        "DeformableDETR":
            ', num_query=20, num_enc_layers=2, num_dec_layers=2',
        "YOLOF": ', norm_eval=False',
    }.get(mtype, "")
    cfg = f'''
model = dict(type="{mtype}", depth=18, num_classes=2, with_mask=False,
             frozen_stages=-1{model_extra})
loss_cls = dict(type="FocalLossDet")
train_cfg = dict({extra})
test_cfg = dict(nms_pre=256, score_thr=0.02,
                max_per_img={1 if mtype in ("DETR", "DeformableDETR") else 5})
data = dict(
    samples_per_gpu={batch},
    train=dict(type="CocoDataset", ann_file="{ann_path}",
               img_prefix="{root}", oversample_thr=0.0),
    val=dict(type="CocoDataset", ann_file="{ann_path}",
             img_prefix="{root}"),
    test=dict(type="CocoDataset", ann_file="{ann_path}",
              img_prefix="{root}"),
)
pipeline = dict(canvas=(96, 128), scales=[(128, 96)], max_gt=4,
                flip_prob={flip})
# adamw: focal-from-scratch on a tiny corpus barely moves under SGD
# (validated: 30ep sgd 0.005 plateaus at loss_cls 1.06 / AP 0).
# DETR-family set-prediction heads are lr-sensitive: the reference
# trains them at AdamW 1e-4 (configs/detr, configs/sparse_rcnn) and
# 1e-3 oscillates without converging — match the reference rate.
optimizer = dict(type="adamw",
                 lr={0.0001 if mtype in ("DETR", "DeformableDETR",
                                         "SparseRCNN") else 0.001},
                 weight_decay=1e-8)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(milestones=[{epochs - 5}], gamma=0.1, warmup_iters=10)
runner = dict(type="EpochBasedRunner", max_epochs={epochs})
checkpoint_config = dict(interval={epochs})
log_config = dict(interval=5)
seed = 0
'''
    path = os.path.join(root, "ss_overfit_cfg.py")
    with open(path, "w") as f:
        f.write(cfg)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="RetinaNet",
                    choices=["RetinaNet", "FCOS", "ATSS", "YOLOX",
                             "YOLOV3", "CenterNet", "DETR", "GFL",
                             "FSAF", "FOVEA", "YOLOF",
                             "RepPointsDetector", "VFNet", "SparseRCNN",
                             "DeformableDETR", "AutoAssign", "NASFCOS",
                             "PAA", "FreeAnchor", "GARetinaNet"])
    ap.add_argument("--root", default="/tmp/retina_overfit")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--noflip", action="store_true",
                    help="disable flip aug (DETR probes)")
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    # DETR-family: larger objects — set prediction at 20-32 px small
    # objects converges impractically slowly even though the loss falls
    # (the trainer-path single-image probe converges in 120 steps)
    # YOLOF: single C5 level (stride 32) has only 12 anchor positions at
    # this canvas — 20-32 px objects fail the 0.15 pos-IoU pair filter
    # (the reference trains it at 800x1333 = 1050 positions), so its
    # harness uses the large-object range too
    obj = ((48, 64) if args.model in ("DETR", "DeformableDETR", "YOLOF")
           else (20, 32))
    ann = make_dataset(args.root, obj_range=obj)
    cfg = write_config(args.root, ann, args.epochs, args.batch, args.model,
                   flip=0.0 if args.noflip else 0.5)
    work = os.path.join(args.root, "work")

    r = subprocess.run(
        [sys.executable, "-m", "iif_tpu.cli.train_det", cfg,
         "--work-dir", work], cwd="/root/repo")
    if r.returncode != 0:
        sys.exit(r.returncode)

    r2 = subprocess.run(
        [sys.executable, "-m", "iif_tpu.cli.test_det", cfg,
         os.path.join(work, "checkpoints"), "--eval", "bbox"],
        cwd="/root/repo")
    sys.exit(r2.returncode)


if __name__ == "__main__":
    main()
