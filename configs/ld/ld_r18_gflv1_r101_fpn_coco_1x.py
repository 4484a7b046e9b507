# Localization Distillation: GFL-R18 student distilled from a frozen
# GFL-R101 teacher (reference configs/ld/ld_r18_gflv1_r101_fpn_coco_1x
# .py: KL T=10 on the per-side box distributions of ATSS positives,
# weighted 0.25).
_base_ = [
    "../_base_/models/retinanet_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="LD", depth=18, teacher_depth=101,
             teacher_ckpt=None)  # point at a trained GFL-R101 ckpt dir
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
