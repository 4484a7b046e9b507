# DeepFashion landmark/clothes detection (reference configs/deepfashion/mask_rcnn_r50_fpn_15e_deepfashion.py; 15 classes).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=15)
data_root = "data/DeepFashion/In-shop/"
data = dict(
    train=dict(type="CocoDataset",
               ann_file=data_root + "annotations/DeepFashion_segmentation_train.json",
               img_prefix=data_root + "Img/", oversample_thr=0.0),
    val=dict(type="CocoDataset",
             ann_file=data_root + "annotations/DeepFashion_segmentation_query.json",
             img_prefix=data_root + "Img/"),
    test=dict(type="CocoDataset",
              ann_file=data_root + "annotations/DeepFashion_segmentation_gallery.json",
              img_prefix=data_root + "Img/"),
)
runner = dict(max_epochs=15)
lr_config = dict(milestones=[8, 11])
evaluation = dict(interval=12, metric=["bbox", "segm"])
