# NAS-FCOS R50 on COCO, 1x (reference
# configs/nas_fcos/nas_fcos_nashead_r50_caffe_fpn_gn-head_4x4_1x_coco.py:
# searched merge-cell FPN + [DCNv2, conv3x3, DCNv2, conv1x1] GN towers;
# FCOS losses; pytorch-style stem in place of caffe).
_base_ = [
    "../_base_/models/fcos_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="NASFCOS", depth=50, num_classes=80, with_mask=False)
pipeline = dict(scales=[(1333, 800)], mask_stride=1, canvas_buckets=False)
optimizer = dict(lr=0.01)
evaluation = dict(interval=12, metric=["bbox"])
