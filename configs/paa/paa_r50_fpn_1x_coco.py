# PAA R50-FPN on COCO, 1x (reference configs/paa/paa_r50_fpn_1x_coco.py:
# MaxIoU 0.1/0.1 candidates, per-level top-9, 2-component GMM
# reassignment (scheme c), focal + GIoU x1.3 (IoU-weighted) + BCE IoU
# branch x0.5, score voting at test, lr 0.01).
_base_ = [
    "../_base_/models/atss_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="PAA", depth=50, num_classes=80, with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
