# FASA + IIF MaskRCNN R50, plain Linear predictors, no RFS
# (reference configs/fasa/fasa_iif_r50_4x4_2x.py: FasaIIFLoss variant raw).
_base_ = ["./fasa_r50_2x.py"]
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="raw", path=None)
