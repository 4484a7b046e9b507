# ATSS R50-FPN base model (reference
# configs/atss/atss_r50_fpn_1x_coco.py: FPN start_level=1 with extra
# convs on_output, GN(32) head towers, 1 anchor/cell
# (octave_base_scale=8, ratio 1), ATSSAssigner topk=9, FocalLoss
# g2/a0.25 cls, GIoU bbox loss weight 2, BCE centerness).
model = dict(
    type="ATSS",
    depth=50,
    num_classes=80,
    with_mask=False,
    frozen_stages=1,
)
loss_cls = dict(type="FocalLossDet")
train_cfg = dict(
    gamma=2.0,
    alpha=0.25,
)
test_cfg = dict(
    nms_pre=1000,
    score_thr=0.05,
    nms_iou=0.6,
    max_per_img=100,
)
