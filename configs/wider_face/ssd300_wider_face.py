# WIDER-Face SSD300 (reference configs/wider_face/ssd300_wider_face.py:
# single 'face' class, XML annotations, lr 0.012, 24 epochs).
_base_ = [
    "../_base_/models/ssd300.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_2x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1)
data_root = "data/WIDERFace/"
data = dict(
    train=dict(type="WIDERFaceDataset",
               ann_file=data_root + "train.txt",
               img_prefix=data_root, oversample_thr=0.0),
    val=dict(type="WIDERFaceDataset",
             ann_file=data_root + "val.txt", img_prefix=data_root),
    test=dict(type="WIDERFaceDataset",
              ann_file=data_root + "val.txt", img_prefix=data_root),
)
optimizer = dict(lr=0.012)
evaluation = dict(interval=4, metric=["mAP"])
