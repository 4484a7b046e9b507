# Pascal VOC 07+12 Faster R-CNN (reference configs/pascal_voc/
# faster_rcnn_r50_fpn_1x_voc0712.py: 20 classes, VOC mAP metric,
# (1000, 600) scale, 4 epochs step [3]).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FasterRCNN", num_classes=20, with_mask=False)
pipeline = dict(canvas=(608, 1024), scales=[(1000, 600)])
data_root = "data/VOCdevkit/"
data = dict(
    train=dict(type="VOCDataset",
               ann_file=data_root + "VOC2007/ImageSets/Main/trainval.txt",
               img_prefix=data_root + "VOC2007/", oversample_thr=0.0),
    val=dict(type="VOCDataset",
             ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
             img_prefix=data_root + "VOC2007/"),
    test=dict(type="VOCDataset",
              ann_file=data_root + "VOC2007/ImageSets/Main/test.txt",
              img_prefix=data_root + "VOC2007/"),
)
optimizer = dict(lr=0.01)
lr_config = dict(milestones=[3])
runner = dict(max_epochs=4)
evaluation = dict(interval=1, metric=["mAP"])
