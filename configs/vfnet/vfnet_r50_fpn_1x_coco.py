# VFNet R50-FPN on COCO, 1x (reference
# configs/vfnet/vfnet_r50_fpn_1x_coco.py: VarifocalLoss alpha .75 gamma
# 2 iou-weighted, GIoU 1.5 / refine 2.0, ATSS assignment topk 9, star
# DCN refine, lr 0.01 with warmup ratio 0.1).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="VFNet", depth=50, num_classes=80, with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
