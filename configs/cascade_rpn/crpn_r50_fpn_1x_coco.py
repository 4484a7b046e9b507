# Cascade RPN (reference configs/cascade_rpn/crpn_r50_caffe_fpn_1x_coco
# .py): 2-stage anchor refinement RPN; evaluate with
# `test_det --eval proposal_fast`. The reference uses a caffe-BGR R50;
# the torchvision R50 stem is this repo's uniform backbone.
_base_ = [
    "../_base_/models/mask_rcnn_r50_fpn.py",
    "../_base_/datasets/lvis_v1_instance.py",
    "../_base_/schedules/schedule_1x.py",
    "../_base_/default_runtime.py",
]
model = dict(type="CascadeRPN", with_mask=False)
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
# test_cfg: nms_pre 2000, nms 0.8, max_per_img 2000 (reference test_cfg)
test_cfg = dict(rpn_nms_pre=2000, rpn_max_per_img=2000)
optimizer_config = dict(grad_clip=dict(max_norm=35, norm_type=2))
evaluation = dict(interval=12, metric=["proposal_fast"])
