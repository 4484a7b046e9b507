# DETR R50 base model (reference configs/detr/detr_r50_8x2_150e_coco.py:
# C5-only backbone, 6+6 transformer at 256d/8 heads/2048 ffn, 100
# queries, Hungarian matching with cls/L1x5/GIoUx2 costs, CE with bg
# weight 0.1 + aux decoder losses).
model = dict(
    type="DETR",
    depth=50,
    num_classes=80,
    num_query=100,
    frozen_stages=1,
    with_mask=False,
)
loss_cls = dict(type="DetCrossEntropyLoss")
train_cfg = dict()
test_cfg = dict(max_per_img=100)
