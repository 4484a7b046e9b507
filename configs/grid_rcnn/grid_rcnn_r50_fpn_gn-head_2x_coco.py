# Grid R-CNN R50-FPN GN-head on COCO, 2x (reference
# configs/grid_rcnn/grid_rcnn_r50_fpn_gn-head_2x_coco.py: 9-point grid
# head (8 GN36 convs + fusion + grouped deconvs), pos_radius 1, random
# jitter 0.15, sigmoid CE x15, boundary voting at test).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="GridRCNN", depth=50, num_classes=80, with_mask=False)
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
