# FASA (no IIF) MaskRCNN R50 with cos-norm heads, no RFS
# (reference configs/fasa/fasa_r50_cos_norm_4x4_2x.py: NormedLinear cls
# temperature 20 — NOT the IIF family's 8 — and NormedConv2d mask temp 20).
_base_ = ["./fasa_r50_2x.py"]
model = dict(cls_predictor="normed", cls_temperature=20.0,
             mask_predictor="normed")
