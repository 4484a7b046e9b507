# YOLOX-s on COCO (reference configs/yolox/yolox_s_8x8_300e_coco.py:
# 640x640, Mosaic + RandomAffine + MixUp + PhotoMetricDistortion extras
# via the loader-side MultiImageMixDataset role; SGD nesterov lr 0.01
# cosine, wd 5e-4).
_base_ = [
    "../_base_/models/yolox_s.py",
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
pipeline = dict(
    canvas=(640, 640),
    scales=[(640, 640)],
    mask_stride=1,
    canvas_buckets=False,
    extras=[
        dict(type="Mosaic", img_scale=(640, 640), pad_val=114.0),
        dict(type="RandomAffine", scaling_ratio_range=(0.1, 2.0),
             border=(-320, -320)),
        dict(type="MixUp", img_scale=(640, 640), ratio_range=(0.8, 1.6),
             pad_val=114.0),
        dict(type="PhotoMetricDistortion"),
    ],
)
optimizer = dict(lr=0.01, weight_decay=5e-4)
evaluation = dict(interval=10, metric=["bbox"])
# YOLOX 300-epoch schedule (reference yolox_s_8x8_300e_coco.py:103-141):
# quadratic-warmup cosine LR with a fixed-LR tail, and the mode-switch
# hook that closes Mosaic/RandomAffine/MixUp + enables the L1 loss for
# the last 15 epochs
runner = dict(max_epochs=300)
lr_config = dict(policy="YOLOX", warmup_iters=5, warmup_ratio=1.0,
                 num_last_epochs=15, min_lr_ratio=0.05)
custom_hooks = [dict(type="YOLOXModeSwitchHook", num_last_epochs=15),
                dict(type="ExpMomentumEMAHook", momentum=0.0001)]
