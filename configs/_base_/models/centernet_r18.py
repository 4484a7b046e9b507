# CenterNet R18 base model (reference
# configs/centernet/centernet_resnet18_140e_coco.py: deconv neck to a
# stride-4 64ch map, gaussian-focal heatmap + L1 wh x0.1 + L1 offset;
# the reference's DCNv2 neck convs are plain 3x3 — deformable conv is a
# deferred native op, SURVEY 2.4).
model = dict(
    type="CenterNet",
    depth=18,
    num_classes=80,
    frozen_stages=-1,
    norm_eval=False,
    with_mask=False,
)
loss_cls = dict(type="DetCrossEntropyLoss")
train_cfg = dict()
test_cfg = dict(
    nms_pre=100,
    score_thr=0.0,
    nms_iou=0.5,
    max_per_img=100,
)
