# Cityscapes instance segmentation (reference configs/cityscapes/mask_rcnn_r50_fpn_1x_cityscapes.py;
# 8 classes, COCO-format json as produced by the standard cityscapes->coco conversion, 8 epochs).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=8)
data_root = "data/cityscapes/"
data = dict(
    train=dict(type="CocoDataset",
               ann_file=data_root + "annotations/instancesonly_filtered_gtFine_train.json",
               img_prefix=data_root + "leftImg8bit/train/", oversample_thr=0.0),
    val=dict(type="CocoDataset",
             ann_file=data_root + "annotations/instancesonly_filtered_gtFine_val.json",
             img_prefix=data_root + "leftImg8bit/val/"),
    test=dict(type="CocoDataset",
              ann_file=data_root + "annotations/instancesonly_filtered_gtFine_val.json",
              img_prefix=data_root + "leftImg8bit/val/"),
)
optimizer = dict(lr=0.01)
lr_config = dict(milestones=[7])
runner = dict(max_epochs=8)
evaluation = dict(interval=12, metric=["bbox", "segm"])
