# FASA + IIF MaskRCNN R50, RFS + cos-norm heads, on LVIS v0.5 (1230
# classes; reference configs/fasa/fasa_iif_r50_rfs_cos_norm_4x4_2x_lvisv05.py
# with path='./lvis_files/idf_1231.csv' — here weights derive from the v0.5
# annotation counts directly, same math).
_base_ = ["./fasa_iif_r50_rfs_cos_norm_2x.py"]
model = dict(num_classes=1230)
data_root = "data/lvis_v0.5/"
data = dict(
    train=dict(ann_file=data_root + "annotations/lvis_v0.5_train.json",
               img_prefix=data_root),
    val=dict(ann_file=data_root + "annotations/lvis_v0.5_val.json",
             img_prefix=data_root),
    test=dict(ann_file=data_root + "annotations/lvis_v0.5_val.json",
              img_prefix=data_root),
)
