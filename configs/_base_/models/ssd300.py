# SSD300-VGG16 base model (reference configs/_base_/models/ssd300.py:
# SSDVGG depth 16 ceil-mode, SSDNeck L2Norm(20) + 4 extra pairs, SSDHead
# softmax CE + 3:1 hard negative mining, MaxIoU 0.5/0.5 single-claim
# low-quality matching, smooth-L1 beta 1, (0.1, 0.2) delta stds).
model = dict(
    type="SSD",
    input_size=300,
    num_classes=80,
    with_mask=False,
)
loss_cls = dict(type="DetCrossEntropyLoss")
train_cfg = dict(
    pos_iou_thr=0.5,
    neg_iou_thr=0.5,
    min_pos_iou=0.0,
)
test_cfg = dict(
    nms_pre=1000,
    score_thr=0.02,
    nms_iou=0.45,
    max_per_img=200,
)
