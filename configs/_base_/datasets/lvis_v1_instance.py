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
    # 6-scale multiscale train, the reference recipe
    # (experiments/iif/iif_r50_4x4_1x/iif_r50_4x4_1x.py:136)
    scales=[(1333, 640), (1333, 672), (1333, 704), (1333, 736),
            (1333, 768), (1333, 800)],
    flip_prob=0.5,
    max_gt=100,
    mask_stride=2,   # gt masks rasterized at 1/2 canvas res (see pipeline)
    # per-scale 32-divisible canvases (672..800 x 1344) instead of one max
    # canvas: one compiled step per bucket, ~15% less conv work on average
    # over the 6-scale recipe
    canvas_buckets=True,
)
evaluation = dict(interval=12, metric=["bbox", "segm"])
