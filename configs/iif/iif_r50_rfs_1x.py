# IIF MaskRCNN R50-FPN LVIS v1, 1x + RFS — the published-26.3-mask-AP
# recipe (reference configs/activations/iif/iif_r50_rfs_4x4_1x.py:
# IIFLoss variant='raw', fc_cls Constant(0.001) init, RFS
# oversample_thr=1e-3 from the sample1e-3 base, SGD 0.02 step [8,11],
# 12 epochs, global batch 16).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1203,
             compute_dtype="bfloat16",
             cls_init=("constant", 0.001))
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="raw",
                path=None)
# RFS oversample_thr=1e-3 inherited from the lvis base (reference
# mask_rcnn_r50_fpn_sample1e-3_mstrain_1x_lvis_v1.py)
train_cfg = dict(rpn_nms_pre=2000)
test_cfg = dict(score_thr=1e-4, max_per_img=300)
