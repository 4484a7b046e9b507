# FASA + IIF MaskRCNN R50 with cos-norm heads, no RFS
# (reference configs/fasa/fasa_iif_r50_cos_norm_4x4_2x.py: NormedLinear
# cls temperature 8, NormedConv2d mask temperature 20).
_base_ = ["./fasa_r50_2x.py"]
model = dict(cls_predictor="normed", cls_temperature=8.0,
             mask_predictor="normed")
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="raw", path=None)
