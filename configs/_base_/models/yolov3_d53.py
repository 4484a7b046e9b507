# YOLOv3-Darknet53 base model (reference
# configs/yolo/yolov3_d53_mstrain-608_273e_coco.py: 3-anchor grids per
# level, GridAssigner 0.5/0.5, BCE cls/conf/xy + MSE wh losses).
model = dict(
    type="YOLOV3",
    num_classes=80,
    with_mask=False,
)
loss_cls = dict(type="DetCrossEntropyLoss")
train_cfg = dict()
test_cfg = dict(
    nms_pre=1000,
    score_thr=0.05,
    nms_iou=0.45,
    max_per_img=100,
)
