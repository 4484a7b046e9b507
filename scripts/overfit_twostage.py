"""On-TPU two-stage exotic-family overfit validation (the families the
cascade/maskrcnn harnesses don't cover): FasterRCNN, MaskScoringRCNN,
HybridTaskCascade, SCNet, PointRend, GridRCNN, TridentFasterRCNN,
FasterRCNNC4, DetectoRS, CascadeRPN.

Same harness as ``overfit_cascade.py``: synthetic bright-square COCO
dataset, smoke-scale config, N epochs through the real train CLI, eval
through the test CLI. Proves each family learns end-to-end on the chip.

Usage:  python scripts/overfit_twostage.py --model FasterRCNN
        [--root /tmp/ts_overfit] [--epochs 30]
"""
import argparse
import os
import subprocess
import sys

from overfit_cascade import make_dataset  # same synthetic dataset

# family -> model-dict extras beyond type/depth/num_classes/frozen_stages
MODELS = {
    "FasterRCNN": 'with_mask=False',
    "MaskScoringRCNN": 'with_mask=True',
    "HybridTaskCascade": 'with_mask=True',
    "SCNet": 'with_mask=True',
    "PointRend": 'with_mask=True',
    "GridRCNN": 'with_mask=False',
    "TridentFasterRCNN": 'with_mask=False',
    "FasterRCNNC4": 'with_mask=False',
    "DetectoRS": 'with_mask=True',
    "CascadeRPN": 'with_mask=False',
}


def write_config(root, ann_path, epochs, batch, mtype):
    proposal_only = mtype == "CascadeRPN"
    cfg = f'''
model = dict(type="{mtype}", depth=18, num_classes=2, frozen_stages=-1,
             {MODELS[mtype]})
loss_cls = dict(type="DetIIFLoss", variant="raw", path=None)
train_cfg = dict(rpn_nms_pre=256, rpn_max_per_img=128,
                 rcnn_num_samples=64, num_mask_rois=16)
test_cfg = dict(rpn_nms_pre=256, rpn_max_per_img=128, score_thr=0.0,
                max_per_img=5)
data = dict(
    samples_per_gpu={batch},
    train=dict(type="CocoDataset", ann_file="{ann_path}",
               img_prefix="{root}", oversample_thr=0.0),
    val=dict(type="CocoDataset", ann_file="{ann_path}",
             img_prefix="{root}"),
    test=dict(type="CocoDataset", ann_file="{ann_path}",
              img_prefix="{root}"),
)
pipeline = dict(canvas=(96, 128), scales=[(128, 96)], max_gt=4)
optimizer = dict(type="sgd", lr=0.01, momentum=0.9, weight_decay=1e-4)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
lr_config = dict(milestones=[{epochs - 5}], gamma=0.1, warmup_iters=5)
runner = dict(type="EpochBasedRunner", max_epochs={epochs})
checkpoint_config = dict(interval={epochs})
log_config = dict(interval=5)
seed = 0
'''
    path = os.path.join(root, "ts_overfit_cfg.py")
    with open(path, "w") as f:
        f.write(cfg)
    return path, proposal_only


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="FasterRCNN", choices=sorted(MODELS))
    ap.add_argument("--root", default="/tmp/ts_overfit")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    os.makedirs(args.root, exist_ok=True)
    ann = make_dataset(args.root)
    cfg, proposal_only = write_config(args.root, ann, args.epochs,
                                      args.batch, args.model)
    work = os.path.join(args.root, "work")

    r = subprocess.run(
        [sys.executable, "-m", "iif_tpu.cli.train_det", cfg,
         "--work-dir", work], cwd="/root/repo")
    if r.returncode != 0:
        sys.exit(r.returncode)

    eval_args = ["--eval", "proposal_fast"] if proposal_only else \
        ["--eval", "bbox"]
    r2 = subprocess.run(
        [sys.executable, "-m", "iif_tpu.cli.test_det", cfg,
         os.path.join(work, "checkpoints")] + eval_args,
        cwd="/root/repo")
    sys.exit(r2.returncode)


if __name__ == "__main__":
    main()
