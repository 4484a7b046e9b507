# TridentNet R50 on COCO, 1x (reference
# configs/tridentnet/tridentnet_r50_caffe_1x_coco.py: C4 Faster R-CNN
# with a 3-branch weight-shared dilated (1,2,3) final stage; branches
# train as extra batch entries, test uses branch 1; pytorch-style stem
# and the repo's Shared2FC head in place of caffe res5 — see
# detection/trident.py docstring).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="TridentFasterRCNN", depth=50, num_classes=80,
             with_mask=False, num_branch=3, test_branch_idx=1)
evaluation = dict(interval=12, metric=["bbox"])
