# Faster R-CNN R50-C4 on COCO, 1x (reference
# configs/faster_rcnn/faster_rcnn_r50_caffe_c4_1x_coco.py +
# configs/_base_/models/faster_rcnn_r50_caffe_c4.py): no FPN — ResNet
# stages 1-3 backbone, single stride-16 RPN level (anchor scales
# 2-32), RoIAlign 14x14, res5 shared head (ResLayer) per RoI.
_base_ = [
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FasterRCNNC4", depth=50, num_classes=80,
             frozen_stages=1, norm_eval=True, with_mask=False,
             compute_dtype="bfloat16")
loss_cls = dict(type="DetCrossEntropyLoss")
# reference C4 rpn_proposal: nms_pre 12000 / max_per_img 2000 at train,
# 6000 / 1000 at test (capped here to the TPU static-slate defaults)
train_cfg = dict(rpn_nms_pre=2000, rpn_max_per_img=2000)
test_cfg = dict(rpn_nms_pre=1000, rpn_max_per_img=1000, score_thr=0.05,
                nms_iou=0.5, max_per_img=100)
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
pipeline = dict(canvas=(800, 1344), scales=[(1333, 800)], with_mask=False)
evaluation = dict(interval=12, metric=["bbox"])
