# IIF MaskRCNN R50-FPN LVIS v1, 1x — the headline config
# (reference experiments/iif/iif_r50_4x4_1x/iif_r50_4x4_1x.py: IIFLoss
# variant='raw', ClassBalancedDataset oversample_thr=0.0, SGD 0.02
# step [8,11], 12 epochs, 4x4 global batch 16).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1203,
             compute_dtype="bfloat16",
             cls_init=("constant", 0.001))  # iif_r50_4x4_1x.py:58-62
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="raw",
                path=None)  # path: optional reference-format idf csv
data = dict(train=dict(oversample_thr=0.0))
# reference train-time rpn_proposal: nms_pre=2000 (iif_r50_4x4_1x.py:95)
train_cfg = dict(rpn_nms_pre=2000)
test_cfg = dict(score_thr=1e-4, max_per_img=300)
