# CentripetalNet (reference configs/centripetalnet/
# centripetalnet_hourglass104_mstest_16x6_210e_coco.py: hourglass-104
# 2 stacks, gaussian-focal corners, guiding shift SmoothL1 x0.05,
# centripetal shift SmoothL1 x1, corner pairing by shifted centers,
# Adam lr 5e-4).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="CentripetalNet", num_classes=80, with_mask=False)
pipeline = dict(scales=[(511, 511)], mask_stride=1, canvas_buckets=False)
optimizer = dict(type="Adam", lr=0.0005)
evaluation = dict(interval=12, metric=["bbox"])
