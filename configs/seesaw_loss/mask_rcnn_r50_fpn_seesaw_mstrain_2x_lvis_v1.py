# Seesaw-loss MaskRCNN R50-FPN on LVIS v1 (reference configs/seesaw_loss/
# mask_rcnn_r50_fpn_sample1e-3_seesaw_loss_mstrain_2x_lvis_v1.py:
# SeesawLoss p=0.8 q=2.0, NormedLinear temperature 20 classifier,
# RFS 1e-3, 6-scale mstrain, 2x schedule, LVIS test caps).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_2x.py",
    "../_base_/default_runtime.py",
]
model = dict(num_classes=1203,
             compute_dtype="bfloat16",
             cls_predictor="normed",
             cls_temperature=20)
loss_cls = dict(_delete_=True, type="SeesawLoss", p=0.8, q=2.0,
                eps=1e-2, loss_weight=1.0)
data = dict(train=dict(oversample_thr=1e-3))
test_cfg = dict(score_thr=1e-4, max_per_img=300)
