# YOLOX-s base model (reference configs/yolox/yolox_s_8x8_300e_coco.py:
# CSPDarknet deepen 0.33 / widen 0.5, PAFPN 128ch 1 CSP block,
# decoupled head, SimOTA center_radius 2.5, IoU-square bbox loss x5).
model = dict(
    type="YOLOX",
    num_classes=80,
    deepen=0.33,
    widen=0.5,
    with_mask=False,
)
loss_cls = dict(type="DetCrossEntropyLoss")
train_cfg = dict()
test_cfg = dict(
    nms_pre=2000,
    score_thr=0.01,
    nms_iou=0.65,
    max_per_img=100,
)
