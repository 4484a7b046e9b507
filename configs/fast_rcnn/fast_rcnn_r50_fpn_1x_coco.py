# Fast R-CNN (reference configs/fast_rcnn/fast_rcnn_r50_fpn_1x_coco.py): trains the RoI heads on externally-supplied proposals
# (proposal_file per split, e.g. from a trained RPN via
# `test_det --eval proposal_fast --out`).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FastRCNN", depth=50, with_mask=False)
data_root = "data/coco/"
data = dict(
    train=dict(type="CocoDataset",
               ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "train2017/", oversample_thr=0.0,
               proposal_file=data_root + "proposals/rpn_r50_fpn_1x_train2017.pkl"),
    val=dict(type="CocoDataset",
             ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "val2017/"),
    test=dict(type="CocoDataset",
              ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "val2017/",
              proposal_file=data_root + "proposals/rpn_r50_fpn_1x_val2017.pkl"),
)
evaluation = dict(interval=12, metric=["bbox"])
