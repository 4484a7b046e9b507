# GA-RetinaNet (reference configs/guided_anchoring/
# ga_retinanet_r50_fpn_1x_coco.py: loc focal + shape BoundedIoU(0.2) +
# guided-anchor focal cls + SmoothL1(0.04) reg; ApproxMaxIoUAssigner
# 0.5/0.4/0.4, assigner 0.5/0.5/0, center_ratio 0.2, ignore_ratio 0.5,
# loc_filter_thr 0.01).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="GARetinaNet")
train_cfg = dict(pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.0)
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
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
