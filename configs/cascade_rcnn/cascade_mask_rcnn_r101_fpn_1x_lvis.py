# Cascade MaskRCNN R101-FPN LVIS v1 (reference configs/fasa cascade
# variants ride this model).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="CascadeMaskRCNN", depth=101, num_classes=1203,
             compute_dtype="bfloat16")
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="raw", path=None)
test_cfg = dict(score_thr=1e-4, max_per_img=300)
# reference cascade rpn_proposal: nms_pre=2000, max_per_img=2000
# (configs/fasa/fasa_iif_cascade_r101_rfs_cos_norm_4x4_2x.py)
train_cfg = dict(rpn_nms_pre=2000, rpn_max_per_img=2000)
