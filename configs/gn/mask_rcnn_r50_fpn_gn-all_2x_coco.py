# GN-all MaskRCNN (reference configs/gn/mask_rcnn_r50_fpn_gn-all_2x_coco
# .py: GroupNorm(32) on backbone/neck/bbox-convs/mask head, 4conv1fc
# bbox head, 2x schedule).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_2x.py",
    "../_base_/default_runtime.py",
]
model = dict(norm="gn", bbox_head_convs=4, bbox_head_fcs=1)
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
