# MaskRCNN Swin-T-FPN on COCO (reference
# configs/swin/mask_rcnn_swin-t-p4-w7_fpn_1x_coco.py: patch 4, window 7,
# embed 96, depths (2,2,6,2); AdamW lr 1e-4 wd 0.05).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(backbone_type="swin-t", frozen_stages=-1)
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
optimizer = dict(type="adamw", lr=1e-4, weight_decay=0.05)
evaluation = dict(interval=12, metric=["bbox", "segm"])
