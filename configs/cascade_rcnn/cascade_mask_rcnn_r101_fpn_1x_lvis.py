# Cascade MaskRCNN R101-FPN LVIS v1 (reference configs/fasa cascade
# variants ride this model).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="CascadeMaskRCNN", depth=101, num_classes=1203)
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="raw", path=None)
test_cfg = dict(score_thr=1e-4, max_per_img=300)
