# RetinaNet R50-FPN base model (reference
# configs/_base_/models/retinanet_r50_fpn.py: FPN start_level=1 with
# P6/P7 convs on C5, 9 anchors/cell octave scales, FocalLoss g2/a0.25,
# MaxIoU pos 0.5 / neg 0.4, no sampling, L1 bbox loss).
model = dict(
    type="RetinaNet",
    depth=50,
    num_classes=80,
    with_mask=False,
    frozen_stages=1,
)
loss_cls = dict(type="FocalLossDet")  # built into SSTrainCfg(gamma, alpha)
train_cfg = dict(
    gamma=2.0,
    alpha=0.25,
    pos_iou_thr=0.5,
    neg_iou_thr=0.4,
    min_pos_iou=0.0,
)
test_cfg = dict(
    nms_pre=1000,
    score_thr=0.05,
    nms_iou=0.5,
    max_per_img=100,
)
