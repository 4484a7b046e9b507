# (reference configs/gn+ws/faster_rcnn_r50_fpn_gn_ws-all_1x_coco.py)
_base_ = ["../gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py"]
model = dict(type="FasterRCNN", conv_ws=True, with_mask=False)
lr_config = dict(milestones=[8, 11])
runner = dict(max_epochs=12)
evaluation = dict(interval=12, metric=["bbox"])
