# FASA + IOF (inverse OBJECT frequency) MaskRCNN R50, RFS + cos-norm heads
# (reference configs/fasa/fasa_iof_base10_r50_rfs_cos_norm_4x4_2x.py:
# FasaIIFLoss variant='base10_obj' — weights from per-class INSTANCE counts
# with log10, the idf csv's *_obj columns).
_base_ = ["./fasa_iif_r50_rfs_cos_norm_2x.py"]
loss_cls = dict(_delete_=True, type="DetIIFLoss", variant="base10_obj",
                path=None)
