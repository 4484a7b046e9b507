"""C4 Faster R-CNN — the non-FPN R-CNN of the reference's
``configs/_base_/models/faster_rcnn_r50_caffe_c4.py`` +
``mmdet/models/roi_heads/shared_heads/res_layer.py``:

- backbone = ResNet stages 1-3 only (``num_stages=3, out_indices=(2,)``)
  giving a single C4 map at stride 16;
- RPN on that one level with anchor scales [2,4,8,16,32] x stride-16
  base (vs the FPN recipes' scale-8-per-level pyramid);
- RoIAlign 14x14 on C4, then **res5 applied per-RoI** as the shared
  head (``ResLayer``, stride 2 -> 7x7), avg-pooled into plain
  ``BBoxHead(with_avg_pool=True)`` cls/reg predictors.

TPU shape notes: identical static-slate treatment as the FPN path —
fixed proposal/RoI counts, masked losses. The per-RoI res5 pass is a
batched (R, 14, 14, C) conv stack, which XLA maps onto the MXU like any
other conv batch; there is no level-scatter at all in C4 (one level).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from iif_tpu.detection.bbox_head import (
    bbox_head_get_bboxes,
    bbox_head_loss,
    bbox_targets,
)
from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    normalize_if_uint8,
)
from iif_tpu.detection.rpn import RPNHead, rpn_loss, rpn_proposals
from iif_tpu.models.resnet import ResLayer, ResNet
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.roi_align import roi_align

from iif_tpu.detection.detector import _DEPTH_LAYERS


class C4BBoxHead(nn.Module):
    """Plain ``BBoxHead(with_avg_pool=True)``: global-avg-pool the 7x7
    shared-head output, then linear cls/reg (class-specific regression,
    reference C4 config ``reg_class_agnostic=False``)."""

    num_classes: int

    def setup(self):
        self.fc_cls = nn.Dense(self.num_classes + 1,
                               kernel_init=nn.initializers.normal(0.01),
                               name="fc_cls")
        self.fc_reg = nn.Dense(self.num_classes * 4,
                               kernel_init=nn.initializers.normal(0.001),
                               name="fc_reg")

    def __call__(self, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        e = x.mean(axis=(1, 2))
        return self.fc_cls(e), self.fc_reg(e), e


class C4FasterRCNN(nn.Module):
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    norm_eval: bool = True
    compute_dtype: object = None
    # kept for CLI plumbing parity with the two-stage family
    with_mask: bool = False
    with_rpn: bool = True

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(
            layers, block, frozen_stages=self.frozen_stages,
            norm_eval=self.norm_eval, num_stages=3,
            dtype=self.compute_dtype, name="backbone")
        exp = 4 if block == "bottleneck" else 1
        self.rpn_head = RPNHead(feat_channels=256 * exp, num_anchors=15,
                                dtype=self.compute_dtype, name="rpn_head")
        self.shared_head = ResLayer(block=block, n_blocks=layers[3],
                                    norm_eval=self.norm_eval,
                                    dtype=self.compute_dtype,
                                    name="shared_head")
        self.bbox_head = C4BBoxHead(self.num_classes, name="bbox_head")

    def extract_feat(self, images: jnp.ndarray, train: bool = False
                     ) -> jnp.ndarray:
        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        return feats[-1]                      # C4, stride 16

    def forward_rpn(self, feat: jnp.ndarray):
        return self.rpn_head([feat])

    def forward_shared(self, roi_feats: jnp.ndarray, train: bool = False):
        return self.shared_head(roi_feats, train=train)

    def forward_bbox(self, shared_feats: jnp.ndarray):
        return self.bbox_head(shared_feats)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        """Init/trace path touching every submodule."""
        feat = self.extract_feat(images, train=train)
        rpn_out = self.rpn_head([feat])
        dummy = jnp.zeros((1, 14, 14, feat.shape[-1]), feat.dtype)
        bbox_out = self.bbox_head(self.shared_head(dummy, train=train))
        return rpn_out, bbox_out


def c4_anchor_generator() -> AnchorGenerator:
    """Reference C4 RPN anchors: scales [2,4,8,16,32] on the single
    stride-16 level (``faster_rcnn_r50_caffe_c4.py`` anchor_generator)."""
    return AnchorGenerator(strides=[16], ratios=[0.5, 1.0, 2.0],
                           scales=[2.0, 4.0, 8.0, 16.0, 32.0])


def c4_loss(
    model: C4FasterRCNN,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    loss_cls,
    cfg: DetTrainCfg = DetTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Forward + losses for one batch (two_stage.py ``forward_train``
    specialized to the single-level/shared-head layout)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    k_rpn, k_rcnn = jax.random.split(key)

    feat, mutated = model.apply(variables, images, True,
                                method="extract_feat",
                                mutable=["batch_stats"])
    cls_scores, bbox_preds = model.apply(variables, feat,
                                         method=C4FasterRCNN.forward_rpn)

    import numpy as np

    gen = c4_anchor_generator()
    fh, fw = feat.shape[1], feat.shape[2]
    anchors_np = gen.grid_anchors([(fh, fw)])
    anchors = jnp.asarray(anchors_np[0])
    valid = jnp.asarray(np.asarray(
        gen.valid_flags([(fh, fw)], (img_h, img_w))[0]))

    l_rpn_cls, l_rpn_bbox = rpn_loss(
        cls_scores, bbox_preds, anchors, valid, batch["gt_boxes"],
        batch["gt_valid"], k_rpn, num_samples=cfg.rpn_num_samples,
        pos_fraction=cfg.rpn_pos_fraction)

    proposals, _, prop_valid = rpn_proposals(
        [jax.lax.stop_gradient(s) for s in cls_scores],
        [jax.lax.stop_gradient(d) for d in bbox_preds],
        [anchors], (img_h, img_w), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)

    tgts = bbox_targets(
        k_rcnn, proposals, prop_valid, batch["gt_boxes"],
        batch["gt_labels"], batch["gt_valid"], model.num_classes,
        num_samples=cfg.rcnn_num_samples,
        pos_fraction=cfg.rcnn_pos_fraction, loss_cls=loss_cls)

    r = cfg.rcnn_num_samples
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)
    rois5 = jnp.concatenate(
        [batch_idx[:, None], tgts.rois.reshape(-1, 4)], axis=1)
    roi_feats = roi_align(feat, rois5, (14, 14), spatial_scale=1.0 / 16)

    # thread the backbone's mutated stats so both BN updates merge
    vars2 = {"params": variables["params"],
             "batch_stats": mutated.get("batch_stats",
                                        variables.get("batch_stats", {}))}
    shared, mutated = model.apply(vars2, roi_feats, True,
                                  method="forward_shared",
                                  mutable=["batch_stats"])
    cls_score, bbox_pred, _ = model.apply(variables, shared,
                                          method="forward_bbox")

    l_cls, l_bbox = bbox_head_loss(
        cls_score, bbox_pred, tgts, loss_cls, model.num_classes,
        loss_bbox=cfg.rcnn_loss_bbox)
    losses = {"loss_cls": l_cls, "loss_bbox": l_bbox,
              "loss_rpn_cls": l_rpn_cls, "loss_rpn_bbox": l_rpn_bbox}
    aux = {"batch_stats": mutated.get("batch_stats", {})}
    return sum(losses.values()), losses, aux


def c4_simple_test(
    model: C4FasterRCNN,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    loss_cls,
    cfg: DetTestCfg = DetTestCfg(),
) -> Dict[str, jnp.ndarray]:
    """Inference: fixed-shape detections (boxes/scores/labels/valid)."""
    b, img_h, img_w, _ = images.shape
    feat = model.apply(variables, images, False, method="extract_feat")
    cls_scores, bbox_preds = model.apply(variables, feat,
                                         method=C4FasterRCNN.forward_rpn)
    gen = c4_anchor_generator()
    anchors = jnp.asarray(
        gen.grid_anchors([(feat.shape[1], feat.shape[2])])[0])
    proposals, _, prop_valid = rpn_proposals(
        cls_scores, bbox_preds, [anchors], (img_h, img_w),
        nms_pre=cfg.rpn_nms_pre, max_per_img=cfg.rpn_max_per_img,
        nms_iou=cfg.rpn_nms_iou)

    p = proposals.shape[1]
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
    rois5 = jnp.concatenate(
        [batch_idx[:, None], proposals.reshape(-1, 4)], axis=1)
    roi_feats = roi_align(feat, rois5, (14, 14), spatial_scale=1.0 / 16)
    shared = model.apply(variables, roi_feats, method="forward_shared")
    cls_score, bbox_pred, _ = model.apply(variables, shared,
                                          method="forward_bbox")

    cls_score = cls_score.reshape(b, p, -1)
    bbox_pred = bbox_pred.reshape(b, p, -1)
    cls_score = jnp.where(prop_valid[..., None], cls_score,
                          jnp.full_like(cls_score, -1e9))

    def _one(props, cs, bp):
        return bbox_head_get_bboxes(
            props, cs, bp, (img_h, img_w), loss_cls,
            scale_factor=None, score_thr=cfg.score_thr,
            nms_iou=cfg.nms_iou, max_per_img=cfg.max_per_img,
            num_classes=model.num_classes,
            nms_kind=getattr(cfg, "nms_kind", "nms"))

    dets, scores, labels, det_valid = jax.vmap(_one)(
        proposals, cls_score, bbox_pred)
    return {"boxes": dets, "scores": scores, "labels": labels,
            "valid": det_valid}
