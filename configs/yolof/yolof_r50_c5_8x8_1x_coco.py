# YOLOF R50-C5 on COCO, 1x (reference
# configs/yolof/yolof_r50_c5_8x8_1x_coco.py: DilatedEncoder neck,
# UniformAssigner match_times=4 pos_ignore 0.15 / neg_ignore 0.7,
# ctr_clamp=32, focal + GIoU, SGD lr 0.12 with backbone lr mult 1/3,
# nms iou 0.6).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="YOLOF", depth=50, num_classes=80, with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.12, momentum=0.9, weight_decay=0.0001)
test_cfg = dict(nms_pre=1000, score_thr=0.05, nms_iou=0.6, max_per_img=100)
evaluation = dict(interval=12, metric=["bbox"])
