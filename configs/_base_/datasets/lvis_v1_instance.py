# LVIS v1 instance segmentation data config (reference:
# configs/_base_/datasets/lvis_v1_instance.py — ClassBalancedDataset with
# oversample_thr over LVISV1Dataset, (1333, 800) keep-ratio scale).
data_root = "data/lvis_v1/"
data = dict(
    samples_per_gpu=4,
    train=dict(
        type="LVISV1Dataset",
        ann_file=data_root + "annotations/lvis_v1_train.json",
        img_prefix=data_root,
        oversample_thr=1e-3,          # RFS; 0.0 disables
    ),
    val=dict(
        type="LVISV1Dataset",
        ann_file=data_root + "annotations/lvis_v1_val.json",
        img_prefix=data_root,
    ),
    test=dict(
        type="LVISV1Dataset",
        ann_file=data_root + "annotations/lvis_v1_val.json",
        img_prefix=data_root,
    ),
)
pipeline = dict(
    canvas=(800, 1344),
    scales=[(1333, 800)],
    flip_prob=0.5,
    max_gt=100,
)
evaluation = dict(interval=12, metric=["bbox", "segm"])
