# PISA RetinaNet (reference configs/pisa/pisa_retinanet_r50_fpn_1x_coco.py:
# ISR-P (k=2, bias=0) anchor reweighting + CARL (k=1, bias=0.2, sigmoid)
# with SmoothL1(beta=0.11) regression).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
train_cfg = dict(isr=(("k", 2.0), ("bias", 0.0)),
                 carl=(("k", 1.0), ("bias", 0.2)))
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
