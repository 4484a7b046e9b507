# Double-Head R-CNN (reference configs/double_heads/
# dh_faster_rcnn_r50_fpn_1x_coco.py: DoubleHeadRoIHead with
# reg_roi_scale_factor=1.3, DoubleConvFCBBoxHead num_convs=4 num_fcs=2,
# CE x2.0 + SmoothL1 x2.0).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FasterRCNN", with_mask=False,
             bbox_head_type="double", reg_roi_scale_factor=1.3)
train_cfg = dict(rcnn_loss_bbox="smooth_l1")
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
evaluation = dict(interval=12, metric=["bbox"])
