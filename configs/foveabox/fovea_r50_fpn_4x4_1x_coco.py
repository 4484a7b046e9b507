# FoveaBox R50-FPN on COCO, 1x (reference
# configs/foveabox/fovea_r50_fpn_4x4_1x_coco.py: base_edge_list
# (16..256), scale_ranges sqrt-area buckets, sigma 0.4, FocalLoss
# gamma 1.5 alpha 0.4, SmoothL1 beta 0.11).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FOVEA", depth=50, num_classes=80, with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
