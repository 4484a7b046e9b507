# FSAF R50-FPN on COCO, 1x (reference configs/fsaf/fsaf_r50_fpn_1x_coco.py:
# CenterRegionAssigner pos/neg scale 0.2, TBLRBBoxCoder normalizer 4,
# FocalLoss + IoULoss, online feature-level selection, lr 0.01,
# grad_clip max_norm 10).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FSAF", depth=50, num_classes=80, with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=10, norm_type=2))
evaluation = dict(interval=12, metric=["bbox"])
