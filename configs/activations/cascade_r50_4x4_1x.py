# sigmoid-CE cascade baseline (reference configs/activations/cascade_r50_4x4_1x.py).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="CascadeMaskRCNN", num_classes=1203,
             compute_dtype="bfloat16", cls_init=("constant", 0.001, -6.5))
loss_cls = dict(_delete_=True, type="DetCrossEntropyLoss", use_sigmoid=True)
data = dict(train=dict(oversample_thr=0.0))
train_cfg = dict(rpn_nms_pre=2000)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
test_cfg = dict(score_thr=1e-4, max_per_img=300)
evaluation = dict(interval=12, metric=["bbox", "segm"])
