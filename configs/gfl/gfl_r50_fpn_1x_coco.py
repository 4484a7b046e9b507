# GFL R50-FPN on COCO, 1x (reference configs/gfl/gfl_r50_fpn_1x_coco.py:
# ATSSAssigner topk=9, QualityFocalLoss beta=2, DistributionFocalLoss
# weight 0.25, GIoULoss weight 2, reg_max=16, lr 0.01).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="GFL", depth=50, num_classes=80, with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
