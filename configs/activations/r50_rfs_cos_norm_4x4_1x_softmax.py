# softmax baseline with cos-norm heads + RFS (reference
# configs/activations/r50_rfs_cos_norm_4x4_1x_softmax.py).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1203, compute_dtype="bfloat16", cls_predictor="normed", cls_temperature=8.0,
             mask_predictor="normed", cls_init=("constant", 0.001, -6.5))
loss_cls = dict(_delete_=True, type="DetCrossEntropyLoss")
data = dict(train=dict(oversample_thr=1e-3))
train_cfg = dict(rpn_nms_pre=2000)
test_cfg = dict(score_thr=1e-4, max_per_img=300)
evaluation = dict(interval=12, metric=["bbox", "segm"])
