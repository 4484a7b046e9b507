# FASA (no IIF) MaskRCNN R50 with repeat-factor sampling, plain predictors
# (reference configs/fasa/fasa_r50_rfs_4x4_2x.py: oversample_thr=1e-3).
_base_ = ["./fasa_r50_2x.py"]
data = dict(train=dict(oversample_thr=1e-3))
