"""TridentNet (Trident Faster R-CNN), static-shape.

Rebuild of the reference TridentNet family
(``mmdet/models/detectors/trident_faster_rcnn.py``, backbone
``mmdet/models/backbones/trident_resnet.py``, roi head
``mmdet/models/roi_heads/trident_roi_head.py``, config
``configs/tridentnet/tridentnet_r50_caffe_1x_coco.py``): a C4-style
Faster R-CNN whose final ResNet stage runs three weight-shared branches
at dilations (1, 2, 3); training treats the branches as extra batch
entries (gts tiled per branch), testing uses only branch 1.

Adaptation noted for parity review: the reference's res5 shared RoI
head becomes this repo's Shared2FC bbox head on the single stride-16
level (the C4 RoI-pipeline topology is preserved; the head family
differs), and the stock image-mean norm replaces the caffe BGR norm.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.bbox_head import (
    Shared2FCBBoxHead,
    bbox_head_get_bboxes,
    bbox_head_loss,
    bbox_targets,
)
from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    normalize_if_uint8,
)
from iif_tpu.detection.roi_extractor import SingleRoIExtractor
from iif_tpu.detection.rpn import RPNHead, rpn_loss, rpn_proposals
from iif_tpu.models.trident_resnet import TridentResNet
from iif_tpu.ops.anchors import AnchorGenerator

C4_STRIDE = 16


def make_c4_anchor_generator() -> AnchorGenerator:
    """C4 RPN anchors (faster_rcnn_r50_caffe_c4.py: scales [2,4,8,16,32]
    ratios [0.5,1,2] on the single stride-16 level)."""
    return AnchorGenerator(strides=[C4_STRIDE], ratios=[0.5, 1.0, 2.0],
                           scales=[2.0, 4.0, 8.0, 16.0, 32.0])


class TridentFasterRCNN(nn.Module):
    num_classes: int = 80
    depth: int = 50
    num_branch: int = 3
    test_branch_idx: int = 1
    frozen_stages: int = 1
    norm_eval: bool = True
    backbone_remat: bool = False
    compute_dtype: object = None
    with_mask: bool = False

    def setup(self):
        self.backbone = TridentResNet(
            depth=self.depth, num_branch=self.num_branch,
            test_branch_idx=self.test_branch_idx,
            frozen_stages=self.frozen_stages, norm_eval=self.norm_eval,
            dtype=self.compute_dtype, name="backbone")
        self.rpn_head = RPNHead(num_anchors=15,
                                dtype=self.compute_dtype,
                                name="rpn_head")
        self.bbox_head = Shared2FCBBoxHead(self.num_classes,
                                           name="bbox_head")

    def extract_feat(self, images, train: bool = False):
        return self.backbone(normalize_if_uint8(images), train=train,
                             return_features=True)

    def forward_rpn(self, feats):
        return self.rpn_head(feats)

    def forward_bbox(self, roi_feats):
        return self.bbox_head(roi_feats)

    def __call__(self, images, train: bool = False):
        feats = self.extract_feat(images, train=train)
        rpn_out = self.rpn_head(feats)
        c = feats[0].shape[-1]
        self.bbox_head(jnp.zeros((1, 7, 7, c), feats[0].dtype))
        return rpn_out


def trident_loss(
    model: TridentFasterRCNN,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    loss_cls,
    cfg: DetTrainCfg = DetTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``trident_faster_rcnn.py`` forward_train: the backbone emits 3
    branch outputs stacked along batch; gts are tiled per branch and
    the standard Faster R-CNN losses run on the 3B virtual batch."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    nb = model.num_branch
    k_rpn, k_rcnn = jax.random.split(key)

    feats, mutated = model.apply(
        variables, images, True, method=TridentFasterRCNN.extract_feat,
        mutable=["batch_stats"])                  # [(3B, H/16, W/16, C)]
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=TridentFasterRCNN.forward_rpn)

    gtb = jnp.tile(batch["gt_boxes"], (nb, 1, 1))
    gtl = jnp.tile(batch["gt_labels"], (nb, 1))
    gtv = jnp.tile(batch["gt_valid"], (nb, 1))

    gen = make_c4_anchor_generator()
    fh, fw = -(-img_h // C4_STRIDE), -(-img_w // C4_STRIDE)
    anchors_np = gen.grid_anchors([(fh, fw)])
    anchors = jnp.asarray(anchors_np[0])
    valid = jnp.asarray(gen.valid_flags([(fh, fw)], (img_h, img_w))[0])

    l_rpn_cls, l_rpn_bbox = rpn_loss(
        cls_scores, bbox_preds, anchors, valid, gtb, gtv, k_rpn,
        num_samples=cfg.rpn_num_samples,
        pos_fraction=cfg.rpn_pos_fraction)
    proposals, _, prop_valid = rpn_proposals(
        [jax.lax.stop_gradient(s) for s in cls_scores],
        [jax.lax.stop_gradient(d) for d in bbox_preds],
        [anchors], (img_h, img_w), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)

    tgts = bbox_targets(
        k_rcnn, proposals, prop_valid, gtb, gtl, gtv,
        model.num_classes, num_samples=cfg.rcnn_num_samples,
        pos_fraction=cfg.rcnn_pos_fraction)
    r = cfg.rcnn_num_samples
    bidx = jnp.repeat(jnp.arange(b * nb, dtype=jnp.float32), r)
    rois5 = jnp.concatenate(
        [bidx[:, None], tgts.rois.reshape(-1, 4)], axis=1)
    extractor = SingleRoIExtractor((7, 7), featmap_strides=(C4_STRIDE,))
    roi_feats = extractor(feats, rois5)
    cls_score, bbox_pred, _ = model.apply(
        variables, roi_feats, method=TridentFasterRCNN.forward_bbox)
    l_cls, l_bbox = bbox_head_loss(cls_score, bbox_pred, tgts, loss_cls,
                                   model.num_classes)
    losses = {"loss_rpn_cls": l_rpn_cls, "loss_rpn_bbox": l_rpn_bbox,
              "loss_cls": l_cls, "loss_bbox": l_bbox}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def trident_simple_test(
    model: TridentFasterRCNN,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    loss_cls,
    cfg: DetTestCfg = DetTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Single-branch (test_branch_idx) C4 Faster R-CNN inference."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=TridentFasterRCNN.extract_feat)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=TridentFasterRCNN.forward_rpn)
    gen = make_c4_anchor_generator()
    fh, fw = -(-img_h // C4_STRIDE), -(-img_w // C4_STRIDE)
    anchors = jnp.asarray(gen.grid_anchors([(fh, fw)])[0])
    proposals, _, prop_valid = rpn_proposals(
        cls_scores, bbox_preds, [anchors], (img_h, img_w),
        nms_pre=cfg.rpn_nms_pre, max_per_img=cfg.rpn_max_per_img,
        nms_iou=cfg.rpn_nms_iou)
    p = proposals.shape[1]
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
    rois5 = jnp.concatenate(
        [bidx[:, None], proposals.reshape(-1, 4)], axis=1)
    extractor = SingleRoIExtractor((7, 7), featmap_strides=(C4_STRIDE,))
    roi_feats = extractor(feats, rois5)
    cls_score, bbox_pred, _ = model.apply(
        variables, roi_feats, method=TridentFasterRCNN.forward_bbox)
    cls_score = cls_score.reshape(b, p, -1)
    bbox_pred = bbox_pred.reshape(b, p, -1)
    cls_score = jnp.where(prop_valid[..., None], cls_score, -1e9)

    def _one(props, cs, bp):
        return bbox_head_get_bboxes(
            props, cs, bp, (img_h, img_w), loss_cls,
            scale_factor=None, score_thr=cfg.score_thr,
            nms_iou=cfg.nms_iou, max_per_img=cfg.max_per_img,
            num_classes=model.num_classes)

    dets, scores, labels, det_valid = jax.vmap(_one)(
        proposals, cls_score, bbox_pred)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": scores, "labels": labels,
            "valid": det_valid}
