# CenterNet R18 on COCO (reference
# configs/centernet/centernet_resnet18_140e_coco.py: 512x512, SGD,
# 140 epochs, RandomCenterCropPad + PhotoMetricDistortion aug).
_base_ = [
    "../_base_/models/centernet_r18.py",
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
pipeline = dict(canvas=(512, 512), scales=[(512, 512)], mask_stride=1,
                canvas_buckets=False,
                extras=[dict(type="PhotoMetricDistortion")])
optimizer = dict(lr=5e-4)
grad_clip = 35.0
evaluation = dict(interval=10, metric=["bbox"])
