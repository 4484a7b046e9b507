# Sparse R-CNN R50-FPN on COCO, 1x (reference
# configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py: 100 learnable
# proposals, 6 DII stages, Hungarian (focal 2 / L1 5 / GIoU 2), AdamW
# lr 2.5e-5 wd 1e-4, grad clip 1).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="SparseRCNN", depth=50, num_classes=80, with_mask=False,
             num_proposals=100, num_dii_stages=6)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(type="AdamW", lr=0.000025, weight_decay=0.0001)
optimizer_config = dict(grad_clip=dict(max_norm=1, norm_type=2))
evaluation = dict(interval=12, metric=["bbox"])
