# 3x multi-scale COCO instance base (reference configs/common/mstrain_3x_coco_instance.py).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
lr_config = dict(milestones=[27, 33])
runner = dict(max_epochs=36)
pipeline = dict(scales=[(1333, 640), (1333, 672), (1333, 704),
                        (1333, 736), (1333, 768), (1333, 800)])
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
evaluation = dict(interval=12, metric=["bbox", "segm"])
