# FASA (no IIF) MaskRCNN R50, RFS + cos-norm heads
# (reference configs/fasa/fasa_r50_rfs_cos_norm_4x4_2x.py: cls temp 20).
_base_ = ["./fasa_r50_2x.py"]
model = dict(cls_predictor="normed", cls_temperature=20.0,
             mask_predictor="normed")
data = dict(train=dict(oversample_thr=1e-3))
