# Training from scratch (reference configs/scratch/mask_rcnn_r50_fpn_
# gn-all_scratch_6x_coco.py: no ImageNet init, nothing frozen, GN-all,
# 73 epochs / steps [65, 71] -- "Rethinking ImageNet Pre-training").
_base_ = ["../gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py"]
model = dict(frozen_stages=-1, norm_eval=False)
lr_config = dict(milestones=[65, 71])
runner = dict(max_epochs=73)
