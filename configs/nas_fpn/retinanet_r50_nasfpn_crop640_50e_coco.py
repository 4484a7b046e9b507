# RetinaNet R50 + NAS-FPN (reference configs/nas_fpn/
# retinanet_r50_nasfpn_crop640_50e_coco.py: NASFPN neck,
# RetinaSepBNHead — conv weights shared across levels, per-level BN —
# assigner neg_iou_thr 0.5, 640x640 crop recipe).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="RetinaNet", head_type="sepbn", neck_type="nasfpn")
train_cfg = dict(neg_iou_thr=0.5)
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
pipeline = dict(scales=[(640, 640)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
