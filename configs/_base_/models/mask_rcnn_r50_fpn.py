# MaskRCNN R50-FPN base model (mirrors the reference's
# configs/_base_/models/mask_rcnn_r50_fpn.py surface, reduced to the knobs
# this framework's detector exposes).
model = dict(
    type="MaskRCNN",
    depth=50,
    num_classes=80,
    with_mask=True,
    cls_predictor="linear",       # 'normed' for cos-norm heads
    mask_predictor="conv",        # 'normed' for cos-norm mask head
    frozen_stages=1,
)
loss_cls = dict(type="DetCrossEntropyLoss")
train_cfg = dict(
    rpn_num_samples=256,
    rpn_pos_fraction=0.5,
    rpn_nms_pre=1000,
    rpn_max_per_img=1000,
    rpn_nms_iou=0.7,
    rcnn_num_samples=512,
    rcnn_pos_fraction=0.25,
    mask_size=28,
    num_mask_rois=128,
    # Pallas multi-level RoIAlign (custom-VJP backward) — falls back to
    # the XLA gather off-TPU / for unsupported shapes automatically
    roi_ext="ml",
)
test_cfg = dict(
    rpn_nms_pre=1000,
    rpn_max_per_img=1000,
    rpn_nms_iou=0.7,
    score_thr=0.05,
    nms_iou=0.5,
    max_per_img=100,
)
