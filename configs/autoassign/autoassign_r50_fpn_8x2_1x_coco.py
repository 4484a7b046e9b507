# AutoAssign R50-FPN on COCO, 1x (reference
# configs/autoassign/autoassign_r50_fpn_8x2_1x_coco.py: learnable
# per-class center prior, pos 0.25 / neg 0.75 / center 0.75 loss
# weights, GIoU x5 localization confidence, lr 0.01).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="AutoAssign", depth=50, num_classes=80, with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
