# YOLOv3-D53 on COCO (reference
# configs/yolo/yolov3_d53_mstrain-608_273e_coco.py: (320..608) mstrain,
# SGD lr 1e-3 wd 5e-4, grad clip 35, 273 epochs).
_base_ = [
    "../_base_/models/yolov3_d53.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
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
pipeline = dict(canvas=(608, 608), scales=[(320, 320), (416, 416),
                                           (608, 608)],
                mask_stride=1, canvas_buckets=False,
                extras=[dict(type="PhotoMetricDistortion")])
optimizer = dict(lr=1e-3, weight_decay=5e-4)
grad_clip = 35.0
evaluation = dict(interval=10, metric=["bbox"])
