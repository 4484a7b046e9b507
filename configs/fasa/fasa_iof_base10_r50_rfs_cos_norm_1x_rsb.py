# FASA + IOF base10 R50, RFS + cos-norm, 1x schedule with an RSB-A1
# pretrained backbone and AdamW (reference
# configs/fasa/fasa_iof_base10_r50_rfs_cos_norm_4x4_1x_rsb.py: AdamW
# lr 2e-4 wd 0.05, paramwise norm_decay_mult=0, 12 epochs step [8, 11],
# backbone init from the mmcls rsb-a1 checkpoint with prefix='backbone.').
_base_ = ["./fasa_iof_base10_r50_rfs_cos_norm_2x.py"]
# local path to the converted rsb-a1 checkpoint (.pth); the 'backbone.'
# prefix of mmcls checkpoints is stripped on load (models/pretrained.py)
model = dict(pretrained_backbone="checkpoints/resnet50_rsb_a1.pth")
optimizer = dict(_delete_=True, type="adamw", lr=2e-4, weight_decay=0.05,
                 paramwise_cfg=dict(norm_decay_mult=0.0))
lr_config = dict(warmup_iters=500, warmup_factor=1e-3, milestones=[8, 11])
runner = dict(type="EpochBasedDynamicRunner", max_epochs=12)
evaluation = dict(metric=["bbox", "segm"], interval=12)
