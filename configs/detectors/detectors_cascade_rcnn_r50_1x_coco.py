# DetectoRS Cascade R-CNN R50 on COCO, 1x (reference
# configs/detectors/detectors_cascade_rcnn_r50_1x_coco.py: SAC in
# stages 2-4, Recursive Feature Pyramid with rfp_steps=2, ASPP feedback,
# learned sigmoid fusion of the two FPN passes).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="DetectoRS", depth=50, num_classes=80, with_mask=True,
             rfp_steps=2)
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
