# Deformable DETR R50 on COCO, 50e (reference
# configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py:
# ChannelMapper C3-C5 + extra level, 6+6 encoder/decoder with
# multi-scale deformable attention (8 heads x 4 points), 300 queries,
# focal 2 / L1 5 / GIoU 2 Hungarian, AdamW lr 2e-4).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="DeformableDETR", depth=50, num_classes=80,
             with_mask=False, num_query=300)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(type="AdamW", lr=0.0002, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=0.1, norm_type=2))
evaluation = dict(interval=12, metric=["bbox"])
