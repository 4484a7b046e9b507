# RetinaNet + FPG (reference configs/fpg/retinanet_r50_fpg_crop640_50e_
# coco.py: C3-C5 + conv extras, 9 bottom-up pathways).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(neck_type="fpg")
pipeline = dict(canvas=(640, 640), scales=[(640, 640)])
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
runner = dict(max_epochs=50)
lr_config = dict(milestones=[30, 40])
evaluation = dict(interval=10, metric=["bbox"])
