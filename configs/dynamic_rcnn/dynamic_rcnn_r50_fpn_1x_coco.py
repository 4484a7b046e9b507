# Dynamic R-CNN (reference configs/dynamic_rcnn/dynamic_rcnn_r50_fpn_1x.py:
# adaptive assigner IoU + adaptive SmoothL1 beta with iou_topk=75,
# beta_topk=10, update_iter_interval=100, initial_iou=0.4,
# initial_beta=1.0; rpn_proposal nms thresh 0.85).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FasterRCNN", with_mask=False)
train_cfg = dict(rcnn_dynamic=True, dynamic_iou_topk=75,
                 dynamic_beta_topk=10, dynamic_interval=100,
                 dynamic_initial_iou=0.4, dynamic_initial_beta=1.0,
                 rpn_nms_iou=0.85)
test_cfg = dict(rpn_nms_iou=0.85)
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
