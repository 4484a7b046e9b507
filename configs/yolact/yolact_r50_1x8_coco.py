# YOLACT R50 on COCO (reference configs/yolact/yolact_r50_1x8_coco.py:
# 3 anchors/cell octave_base_scale=3, softmax CE with 3:1 OHEM,
# SmoothL1 * 1.5, 32 prototypes on P3 with BCE mask loss * 6.125
# reweighted by 1/box-area, sigmoid semantic aux head, fast NMS
# iou 0.5 / top_k 200).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="YOLACT", depth=50, num_classes=80, with_mask=True)
pipeline = dict(scales=[(550, 550)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.001, momentum=0.9, weight_decay=0.0005)
train_cfg = dict(_delete_=True)
test_cfg = dict(_delete_=True, nms_pre=1000, score_thr=0.05, nms_iou=0.5, max_per_img=100)
