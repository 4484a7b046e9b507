# FreeAnchor RetinaNet (reference configs/free_anchor/
# retinanet_free_anchor_r50_fpn_1x_coco.py: stock RetinaNet body,
# FreeAnchor bag loss with pre_anchor_topk=50, bbox_thr=0.6, gamma=2.0,
# alpha=0.5, SmoothL1(beta=0.11) x0.75, grad_clip max_norm 35).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FreeAnchor")
data_root = "data/coco/"
data = dict(
    train=dict(type="CocoDataset",
               ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "train2017/", oversample_thr=0.0),
    val=dict(type="CocoDataset",
             ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "val2017/"),
    test=dict(type="CocoDataset",
              ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "val2017/"),
)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01, grad_clip=35.0)
evaluation = dict(interval=12, metric=["bbox"])
