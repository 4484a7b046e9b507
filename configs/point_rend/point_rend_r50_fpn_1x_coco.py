# PointRend R50-FPN on COCO, 1x (reference
# configs/point_rend/point_rend_r50_caffe_fpn_mstrain_1x_coco.py:
# CoarseMaskHead (2 FCs, 7x7) + MaskPointHead (3 FCs), train 196 points
# 3x oversample 0.75 importance, test 5 subdivision steps x2 with 784
# points; pytorch-style R50 stem in place of caffe).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="PointRend", depth=50, num_classes=80, with_mask=True)
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
