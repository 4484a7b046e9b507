# softmax-CE LVIS baseline (reference configs/activations/x101_4x4_1x_softmax.py:
# CrossEntropyLoss use_sigmoid=False, fc_cls Constant(0.001) bias -6.5).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1203, compute_dtype="bfloat16", depth=101, backbone_type="resnext32x4d", cls_init=("constant", 0.001, -6.5))
loss_cls = dict(_delete_=True, type="DetCrossEntropyLoss", use_sigmoid=False)
data = dict(train=dict(oversample_thr=0.0))
train_cfg = dict(rpn_nms_pre=2000)
test_cfg = dict(score_thr=1e-4, max_per_img=300)
evaluation = dict(interval=12, metric=["bbox", "segm"])
