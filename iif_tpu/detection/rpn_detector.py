"""RPN-only detector — region proposals as the final product.

Rebuild of ``mmdet/models/detectors/rpn.py`` (class ``RPN``): backbone ->
FPN -> RPNHead; training is the RPN anchor loss alone, inference returns
the class-agnostic proposal slate (evaluated with the proposal-recall
metric, ``test_det --eval proposal_fast``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    fpn_shapes,
    make_anchor_generator,
    normalize_if_uint8,
)
from iif_tpu.detection.necks import FPN
from iif_tpu.detection.rpn import RPNHead, rpn_loss, rpn_proposals
from iif_tpu.models.resnet import ResNet

from iif_tpu.detection.detector import _DEPTH_LAYERS  # noqa: E402  (canonical table)


class RPNDetector(nn.Module):
    """``type='RPN'`` (reference configs/rpn/rpn_r50_fpn_1x_coco.py)."""

    num_classes: int = 1          # class-agnostic; uniform CLI surface
    depth: int = 50
    frozen_stages: int = 1
    norm_eval: bool = True
    backbone_remat: bool = False
    compute_dtype: object = None
    with_mask: bool = False

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5,
                        dtype=self.compute_dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=3, dtype=self.compute_dtype,
                                name="rpn_head")

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        return self.neck(feats)

    def forward_rpn(self, fpn_feats):
        return self.rpn_head(fpn_feats)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        return self.rpn_head(self.extract_feat(images, train=train))


def rpn_only_loss(
    model: RPNDetector,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: DetTrainCfg = DetTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """RPN anchor losses only (``rpn.py`` forward_train)."""
    images = batch["image"]
    _, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=RPNDetector.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=RPNDetector.forward_rpn)

    gen = make_anchor_generator()
    shapes = fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(np.concatenate(gen.grid_anchors(shapes), axis=0))
    valid = jnp.asarray(np.concatenate(
        gen.valid_flags(shapes, (img_h, img_w)), axis=0))
    l_cls, l_bbox = rpn_loss(
        cls_scores, bbox_preds, anchors, valid, batch["gt_boxes"],
        batch["gt_valid"], key, num_samples=cfg.rpn_num_samples,
        pos_fraction=cfg.rpn_pos_fraction)
    losses = {"loss_rpn_cls": l_cls, "loss_rpn_bbox": l_bbox}
    return l_cls + l_bbox, losses, {
        "batch_stats": mutated.get("batch_stats", {})}


def rpn_only_simple_test(
    model: RPNDetector,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: DetTestCfg = DetTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Proposal slate as detections: labels all 0 (``rpn.py``
    simple_test returns the proposal boxes+scores)."""
    _, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=RPNDetector.extract_feat)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=RPNDetector.forward_rpn)
    gen = make_anchor_generator()
    anchors_np = gen.grid_anchors(fpn_shapes((img_h, img_w)))
    boxes, scores, valid = rpn_proposals(
        cls_scores, bbox_preds, [jnp.asarray(a) for a in anchors_np],
        (img_h, img_w), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)
    if scale_factor is not None:
        boxes = boxes / scale_factor[:, None, :]
    return {"boxes": boxes, "scores": scores,
            "labels": jnp.zeros(scores.shape, jnp.int32), "valid": valid}
