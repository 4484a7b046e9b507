# Albumentations pipeline example (reference configs/albu_example/mask_rcnn_r50_fpn_albu_1x_coco.py;
# the Albu adapter runs when the optional albumentations package is importable).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
pipeline = dict(extras=[dict(
    type="Albu",
    transforms=[
        dict(type="ShiftScaleRotate", shift_limit=0.0625,
             scale_limit=0.0, rotate_limit=0, interpolation=1, p=0.5),
        dict(type="RandomBrightnessContrast", brightness_limit=[0.1, 0.3],
             contrast_limit=[0.1, 0.3], p=0.2),
        dict(type="ChannelShuffle", p=0.1),
        dict(type="Blur", blur_limit=3, p=0.1),
    ])])
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
