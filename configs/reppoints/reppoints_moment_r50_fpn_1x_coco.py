# RepPoints-moment R50-FPN on COCO, 1x (reference
# configs/reppoints/reppoints_moment_r50_fpn_1x_coco.py: 9 points,
# gradient_mul 0.1, point_base_scale 4, moment transform, PointAssigner
# (scale 4, pos_num 1) init / MaxIoU (0.5/0.4) refine, SmoothL1 beta
# 0.11 with init weight 0.5 / refine 1.0, lr 0.01).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="RepPointsDetector", depth=50, num_classes=80,
             with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
