# SSD300 on COCO (reference configs/ssd/ssd300_coco.py: 300x300
# keep_ratio=False resize, RepeatDataset x5, SGD lr 2e-3 wd 5e-4, 2x).
_base_ = [
    "../_base_/models/ssd300.py",
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
pipeline = dict(canvas=(300, 300), scales=[(300, 300)], keep_ratio=False,
                mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=2e-3, weight_decay=5e-4)
evaluation = dict(interval=12, metric=["bbox"])
