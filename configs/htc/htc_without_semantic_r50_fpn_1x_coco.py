# HTC R50-FPN without the semantic branch, 1x (reference
# configs/htc/htc_without_semantic_r50_fpn_1x_coco.py: 3-stage cascade,
# interleaved bbox->mask execution, mask information flow).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="HybridTaskCascade", depth=50, num_classes=80,
             with_mask=True, with_semantic=False)
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
