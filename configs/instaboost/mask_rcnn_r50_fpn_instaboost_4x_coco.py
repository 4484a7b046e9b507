# InstaBoost instance-paste augmentation, 4x schedule (reference
# configs/instaboost/mask_rcnn_r50_fpn_instaboost_4x_coco.py).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
pipeline = dict(extras=[dict(
    type="InstaBoost",
    action_candidate=("normal", "horizontal", "skip"),
    action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
    theta=(-1, 1), color_prob=0.5, hflag=False, aug_ratio=0.5)])
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
lr_config = dict(milestones=[32, 44])
runner = dict(max_epochs=48)
evaluation = dict(interval=12, metric=["bbox", "segm"])
