# DETR R50 on COCO (reference configs/detr/detr_r50_8x2_150e_coco.py:
# AdamW lr 1e-4 (backbone 1e-5), wd 1e-4, grad clip 0.1, 150 epochs).
_base_ = [
    "../_base_/models/detr_r50.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
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
optimizer = dict(type="adamw", lr=1e-4, weight_decay=1e-4)
grad_clip = 0.1
evaluation = dict(interval=10, metric=["bbox"])
