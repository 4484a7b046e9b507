# FASA (no IIF) MaskRCNN R50, plain Linear predictors, no RFS, 2x dynamic
# runner (reference configs/fasa/fasa_r50_4x4_2x.py: CrossEntropyCounterLoss
# + Shared2FCFASABBoxHead, oversample off, EpochBasedDynamicRunner 24 ep).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1203, compute_dtype="bfloat16")
# DetCrossEntropyLoss carries the FASA per-class cum-loss counters
# (reference fasa_loss.py CrossEntropyCounterLoss)
loss_cls = dict(_delete_=True, type="DetCrossEntropyLoss")
data = dict(train=dict(oversample_thr=0.0))
fasa_cfg = dict(decay_ratio=0.1, loss_aug_weight=0.1, dynamic_up=1.1,
                dynamic_down=0.9, instance_prob_power=1.0,
                instance_prob_scale=1.0)
lr_config = dict(milestones=[16, 22])
runner = dict(type="EpochBasedDynamicRunner", max_epochs=24)
test_cfg = dict(score_thr=1e-4, max_per_img=300)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
train_cfg = dict(rpn_nms_pre=2000)
