# Panoptic FPN R50 on COCO panoptic, 1x (reference
# configs/panoptic_fpn/panoptic_fpn_r50_fpn_1x_coco.py: MaskRCNN +
# PanopticFPNHead (54 = 53 stuff + merged-things channels, CE weight
# 0.5), heuristic instance/stuff fusion at test time; dataset =
# CocoPanopticDataset over panoptic_{split}2017.json + id-encoded PNGs).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="PanopticFPN", depth=50, num_classes=80,
             num_stuff_classes=53, with_mask=True)
data_root = "data/coco/"
data = dict(
    train=dict(type="CocoPanopticDataset",
               ann_file=data_root + "annotations/panoptic_train2017.json",
               img_prefix=data_root + "train2017/",
               seg_prefix=data_root + "annotations/panoptic_train2017/",
               oversample_thr=0.0),
    val=dict(type="CocoPanopticDataset",
             ann_file=data_root + "annotations/panoptic_val2017.json",
             img_prefix=data_root + "val2017/",
             seg_prefix=data_root + "annotations/panoptic_val2017/"),
    test=dict(type="CocoPanopticDataset",
              ann_file=data_root + "annotations/panoptic_val2017.json",
              img_prefix=data_root + "val2017/",
              seg_prefix=data_root + "annotations/panoptic_val2017/"),
)
# carry the semantic map through resize/flip/pad at the head's stride
pipeline = dict(with_seg=True, seg_stride=4)
# heuristic fusion knobs (reference panoptic_fusion_heads/
# heuristic_fusion_head.py)
panoptic = dict(overlap_thr=0.5, stuff_area_limit=4096)
