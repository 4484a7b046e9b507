# PISA MaskRCNN (reference configs/pisa/pisa_mask_rcnn_r50_fpn_1x_coco.py:
# ScoreHLRSampler(k=0.5, bias=0) negatives + ISR-P (k=2, bias=0) +
# CARL (k=1, bias=0.2)).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
train_cfg = dict(rcnn_neg_sampler="score_hlr",
                 rcnn_sampler_cfg=(("k", 0.5), ("bias", 0.0),
                                   ("score_thr", 0.05), ("iou_thr", 0.5)),
                 rcnn_isr=(("k", 2.0), ("bias", 0.0)),
                 rcnn_carl=(("k", 1.0), ("bias", 0.2)))
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
