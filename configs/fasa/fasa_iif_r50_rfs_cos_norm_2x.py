# FASA + IIF MaskRCNN R50 with repeat-factor sampling and cosine-norm
# heads, 2x (reference experiments/fasa_iif_r50_rfs_cos_norm_4x4_2x/...:
# NormedLinear cls head temperature 8, NormedConv2d mask head temp 20,
# RFS oversample_thr=1e-3, EpochBasedDynamicRunner 24 epochs, fasa_cfg).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1203, cls_predictor="normed",
             mask_predictor="normed", compute_dtype="bfloat16")
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="raw", path=None)
data = dict(train=dict(oversample_thr=1e-3))
fasa_cfg = dict(decay_ratio=0.1, loss_aug_weight=0.1, dynamic_up=1.1,
                dynamic_down=0.9, instance_prob_power=1.0,
                instance_prob_scale=1.0)
lr_config = dict(milestones=[16, 22])
runner = dict(type="EpochBasedDynamicRunner", max_epochs=24)
test_cfg = dict(score_thr=1e-4, max_per_img=300)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
train_cfg = dict(rpn_nms_pre=2000)  # reference rpn_proposal nms_pre=2000
