# GHM RetinaNet (reference configs/ghm/retinanet_ghm_r50_fpn_1x_coco.py:
# GHMC bins=30 momentum=0.75 + GHMR mu=0.02 bins=10 momentum=0.7 x10,
# grad_clip max_norm 35).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
train_cfg = dict(loss_kind="ghm", ghm_bins=30, ghm_momentum=0.75,
                 ghmr_mu=0.02, ghmr_bins=10, ghmr_momentum=0.7,
                 ghmr_weight=10.0)
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
optimizer = dict(lr=0.01, grad_clip=35.0)
evaluation = dict(interval=12, metric=["bbox"])
