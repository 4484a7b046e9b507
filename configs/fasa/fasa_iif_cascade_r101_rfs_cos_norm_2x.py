# FASA + IIF Cascade MaskRCNN R101, repeat-factor sampling, cos-norm
# heads, 2x dynamic runner — the reference's flagship cascade experiment
# (configs/fasa/fasa_iif_cascade_r101_rfs_cos_norm_4x4_2x.py): per-stage
# Shared2FCFASABBoxHead with FasaIIFLoss, NormedLinear cls (temp 8),
# NormedConv2d mask head (temp 20), class-SPECIFIC regressors, stage stds
# exactly as that config declares them (incl. the 0.33 third stage).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(
    type="CascadeMaskRCNN",
    depth=101,
    num_classes=1203,
    cls_predictor="normed",
    mask_predictor="normed",
    reg_class_agnostic=False,
    stage_stds=[[0.1, 0.1, 0.2, 0.2], [0.05, 0.05, 0.1, 0.1],
                [0.33, 0.33, 0.067, 0.067]],
    compute_dtype="bfloat16",   # TPU stand-in for fp16 loss_scale=512
)
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="raw", path=None)
data = dict(train=dict(oversample_thr=1e-3))
fasa_cfg = dict(decay_ratio=0.1, loss_aug_weight=0.1, dynamic_up=1.1,
                dynamic_down=0.9, instance_prob_power=1.0,
                instance_prob_scale=1.0)
lr_config = dict(milestones=[16, 22])
runner = dict(type="EpochBasedDynamicRunner", max_epochs=24)
# reference cascade rpn_proposal: nms_pre=2000, max_per_img=2000
train_cfg = dict(rpn_nms_pre=2000, rpn_max_per_img=2000)
test_cfg = dict(score_thr=1e-4, nms_iou=0.3, max_per_img=300)
