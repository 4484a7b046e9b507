# Libra R-CNN (reference configs/libra_rcnn/
# libra_faster_rcnn_r50_fpn_1x_coco.py): BFP refine neck, BalancedL1
# regression, CombinedSampler = InstanceBalancedPos x IoUBalancedNeg
# (floor_thr=-1, floor_fraction=0, num_bins=3).
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="FasterRCNN", with_mask=False, neck_type="bfp")
train_cfg = dict(rcnn_loss_bbox="balanced_l1",
                 rcnn_pos_sampler="instance_balanced",
                 rcnn_neg_sampler="iou_balanced",
                 rcnn_sampler_cfg=(("floor_thr", -1.0),
                                   ("floor_fraction", 0.0),
                                   ("num_bins", 3)))
data_root = "data/coco/"
data = dict(
    train=dict(type="CocoDataset",
               ann_file=data_root + "annotations/instances_train2017.json",
               img_prefix=data_root + "train2017/", oversample_thr=0.0),
    val=dict(type="CocoDataset",
             ann_file=data_root + "annotations/instances_val2017.json",
             img_prefix=data_root + "val2017/"),
    test=dict(type="CocoDataset",
              ann_file=data_root + "annotations/instances_val2017.json",
              img_prefix=data_root + "val2017/"),
)
evaluation = dict(interval=12, metric=["bbox"])
