# CornerNet HourglassNet-104 on COCO (reference
# configs/cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py:
# 2-stack hourglass, BiCornerPool corner branches, gaussian focal
# heatmaps, associative embedding pull/push x0.1, smooth-L1 offsets,
# Adam lr 5e-4, decode top-100 corners / embedding distance 0.5).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="CornerNet", num_classes=80, with_mask=False)
pipeline = dict(scales=[(511, 511)], mask_stride=1, canvas_buckets=False)
optimizer = dict(type="Adam", lr=0.0005)
evaluation = dict(interval=12, metric=["bbox"])
