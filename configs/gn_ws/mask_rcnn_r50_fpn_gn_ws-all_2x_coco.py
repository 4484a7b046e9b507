# GN + Weight Standardization (reference configs/gn+ws/mask_rcnn_r50_fpn
# _gn_ws-all_2x_coco.py: ConvWS everywhere + GN(32), 4conv1fc head).
_base_ = ["../gn/mask_rcnn_r50_fpn_gn-all_2x_coco.py"]
model = dict(conv_ws=True)
