# ATSS R50-FPN on COCO, 1x (reference
# configs/atss/atss_r50_fpn_1x_coco.py; lr 0.01, step [8, 11]).
_base_ = [
    "../_base_/models/atss_r50_fpn.py",
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
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
