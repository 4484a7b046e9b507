# LVIS v1 baseline with RFS 1e-3 (reference configs/lvis/mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py:
# softmax CE, score_thr 1e-4 + 300 dets, the base of every IIF/FASA experiment).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1203, compute_dtype="bfloat16")
data = dict(train=dict(oversample_thr=1e-3))
test_cfg = dict(score_thr=1e-4, max_per_img=300)
evaluation = dict(interval=12, metric=["bbox", "segm"])
