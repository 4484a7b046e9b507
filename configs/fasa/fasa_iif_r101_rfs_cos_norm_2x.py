# FASA + IIF MaskRCNN R101, RFS + cos-norm heads
# (reference configs/fasa/fasa_iif_r101_rfs_cos_norm_4x4_2x.py).
_base_ = ["./fasa_iif_r50_rfs_cos_norm_2x.py"]
model = dict(depth=101)
