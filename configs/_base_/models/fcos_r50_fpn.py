# FCOS R50-FPN base model (reference
# configs/fcos/fcos_r50_caffe_fpn_gn-head_1x_coco.py: FPN start_level=1
# with extra convs on_output + relu, GN(32) head towers, per-level
# regress ranges, IoU bbox loss, centerness branch).
model = dict(
    type="FCOS",
    depth=50,
    num_classes=80,
    with_mask=False,
    frozen_stages=1,
)
loss_cls = dict(type="FocalLossDet")
train_cfg = dict(
    gamma=2.0,
    alpha=0.25,
    center_sampling=False,
    iou_loss_mode="log",
)
test_cfg = dict(
    nms_pre=1000,
    score_thr=0.05,
    nms_iou=0.5,
    max_per_img=100,
)
