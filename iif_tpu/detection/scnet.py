"""SCNet (Sample Consistency Network), static-shape.

Rebuild of the reference SCNet family
(``mmdet/models/detectors/scnet.py``, roi head
``mmdet/models/roi_heads/scnet_roi_head.py``, heads
``mask_heads/global_context_head.py`` / ``mask_heads/feature_relay_head.py``
/ ``bbox_heads/scnet_bbox_head.py``, config
``configs/scnet/scnet_r50_fpn_1x_coco.py``): a 3-stage cascade whose
RoI features are fused with a GLOBAL CONTEXT vector (4 convs on the top
FPN level -> GAP, trained as per-image multilabel BCE) at every stage,
and a SINGLE mask head fed by a FEATURE RELAY of the last bbox stage's
shared-fc embedding (fc -> 7x7x256 -> 2x bilinear upsample, added onto
the 14x14 mask RoI features). The optional fused-semantic branch of the
full config is shared with HTC (htc.py FusedSemanticHead).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.bbox_head import (
    BBOX_TARGET_MEANS,
    BBOX_TARGET_STDS,
    bbox_targets,
)
from iif_tpu.detection.cascade import (
    CascadeMaskRCNN,
    _refine,
    _select_pred,
    cascade_simple_test,
)
from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    fpn_shapes,
    make_anchor_generator,
    resolve_gt_masks,
)
from iif_tpu.detection.mask_head import mask_head_loss, mask_targets
from iif_tpu.detection.roi_extractor import SingleRoIExtractor
from iif_tpu.detection.rpn import rpn_loss, rpn_proposals
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms

normal_init = nn.initializers.normal(stddev=0.01)


class GlobalContextHead(nn.Module):
    """``global_context_head.py``: 4 convs on the top level -> GAP;
    the pooled feature fuses into every RoI, the fc trains multilabel
    presence with BCE (loss_weight 3.0 in the SCNet config)."""
    num_classes: int
    num_convs: int = 4
    channels: int = 256

    @nn.compact
    def __call__(self, top_feat: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = top_feat
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                name=f"conv{i}")(x))
        pooled = x.mean(axis=(1, 2))                  # (B, C)
        mc_pred = nn.Dense(self.num_classes, kernel_init=normal_init,
                           name="fc")(pooled)
        return mc_pred, pooled


class FeatureRelayHead(nn.Module):
    """``feature_relay_head.py``: shared-fc embedding -> 7x7x256 map,
    2x bilinear upsample (align_corners=True)."""
    out_channels: int = 256
    roi_feat_size: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:   # (R, 1024)
        s = self.roi_feat_size
        h = nn.Dense(s * s * self.out_channels, name="fc")(x)
        h = h.reshape(-1, s, s, self.out_channels)
        # align_corners=True bilinear x2
        r = h.shape[0]
        return jax.image.resize(h, (r, s * 2, s * 2, self.out_channels),
                                "bilinear")


class SCNet(CascadeMaskRCNN):
    """``type='SCNet'``. Single mask head (index 0) + glbctx + relay."""

    def setup(self):
        super().setup()
        self.glbctx_head = GlobalContextHead(self.num_classes,
                                             name="glbctx_head")
        self.feat_relay_head = FeatureRelayHead(name="feat_relay_head")

    def forward_glbctx(self, top_feat):
        return self.glbctx_head(top_feat)

    def forward_relay(self, embedding):
        return self.feat_relay_head(embedding)

    def __call__(self, images, train: bool = False):
        out = super().__call__(images, train)
        feats = self.extract_feat(images, train=train)
        self.glbctx_head(feats[-1])
        self.feat_relay_head(jnp.zeros((1, 1024)))
        return out


def scnet_loss(
    model: SCNet,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    loss_cls_per_stage: Sequence,
    cfg: DetTrainCfg = DetTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``scnet_roi_head.py:206-313`` forward_train."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    keys = jax.random.split(key, model.num_stages + 2)

    feats, mutated = model.apply(
        variables, images, True, method=SCNet.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=SCNet.forward_rpn)

    gen = make_anchor_generator()
    shapes = fpn_shapes((img_h, img_w))
    anchors_np = gen.grid_anchors(shapes)
    anchors = jnp.asarray(np.concatenate(anchors_np, 0))
    valid = jnp.asarray(np.concatenate(
        gen.valid_flags(shapes, (img_h, img_w)), 0))
    l_rpn_cls, l_rpn_bbox = rpn_loss(
        cls_scores, bbox_preds, anchors, valid, batch["gt_boxes"],
        batch["gt_valid"], keys[0], num_samples=cfg.rpn_num_samples,
        pos_fraction=cfg.rpn_pos_fraction)
    proposals, _, prop_valid = rpn_proposals(
        [jax.lax.stop_gradient(s) for s in cls_scores],
        [jax.lax.stop_gradient(d) for d in bbox_preds],
        [jnp.asarray(a) for a in anchors_np], (img_h, img_w),
        nms_pre=cfg.rpn_nms_pre, max_per_img=cfg.rpn_max_per_img,
        nms_iou=cfg.rpn_nms_iou)

    losses: Dict[str, jnp.ndarray] = {
        "loss_rpn_cls": l_rpn_cls, "loss_rpn_bbox": l_rpn_bbox}

    # global context: multilabel presence BCE x3
    mc_pred, glbctx = model.apply(variables, feats[-1],
                                  method=SCNet.forward_glbctx)
    onehot = jax.nn.one_hot(
        jnp.clip(batch["gt_labels"], 0, model.num_classes - 1),
        model.num_classes) * batch["gt_valid"][..., None]
    presence = (onehot.sum(1) > 0).astype(jnp.float32)   # (B, C)
    mc32 = mc_pred.astype(jnp.float32)
    bce = (jnp.maximum(mc32, 0) - mc32 * presence
           + jnp.log1p(jnp.exp(-jnp.abs(mc32))))
    losses["loss_glbctx"] = 3.0 * bce.mean()

    extractor = SingleRoIExtractor((7, 7))
    mask_extractor = SingleRoIExtractor((14, 14))
    r = cfg.rcnn_num_samples
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)

    relayed = None
    last_tgts = None
    last_rois5 = None
    for stage in range(model.num_stages):
        iou = model.stage_ious[stage]
        stds = model.stage_stds[stage]
        sw = model.stage_weights[stage]
        tgts = bbox_targets(
            keys[stage + 1], proposals, prop_valid, batch["gt_boxes"],
            batch["gt_labels"], batch["gt_valid"], model.num_classes,
            num_samples=r, pos_fraction=cfg.rcnn_pos_fraction,
            pos_iou_thr=iou, neg_iou_thr=iou, min_pos_iou=iou,
            add_gt_as_proposals=stage == 0)
        rois5 = jnp.concatenate(
            [batch_idx[:, None], tgts.rois.reshape(-1, 4)], axis=1)
        roi_feats = extractor(feats[:4], rois5)
        # fuse per-image global context into every roi
        roi_feats = roi_feats + glbctx[
            rois5[:, 0].astype(jnp.int32)][:, None, None, :]
        cls_score, bbox_pred, embedding = model.apply(
            variables, roi_feats, stage,
            method=SCNet.forward_bbox_stage)

        labels = tgts.labels.reshape(-1)
        lw = tgts.label_weights.reshape(-1)
        bw = tgts.bbox_weights.reshape(-1)
        losses[f"s{stage}.loss_cls"] = sw * loss_cls_per_stage[stage](
            cls_score, labels, weight=lw, avg_factor=lw.sum())
        gt_for_roi = tgts.bbox_targets.reshape(-1, 4)
        gt_boxes_roi = delta2bbox(tgts.rois.reshape(-1, 4), gt_for_roi,
                                  BBOX_TARGET_MEANS, BBOX_TARGET_STDS)
        tgt = bbox2delta(tgts.rois.reshape(-1, 4), gt_boxes_roi,
                         (0, 0, 0, 0), stds)
        pred4 = _select_pred(bbox_pred, labels, model.num_classes,
                             model.reg_class_agnostic)
        l1 = jnp.abs(pred4 - tgt).sum(-1)
        losses[f"s{stage}.loss_bbox"] = sw * (l1 * bw).sum() / jnp.maximum(
            lw.sum(), 1.0)

        relayed = embedding
        last_tgts = tgts
        last_rois5 = rois5
        if stage < model.num_stages - 1:
            refined = _refine(tgts.rois.reshape(-1, 4),
                              jax.lax.stop_gradient(pred4),
                              (img_h, img_w), stds)
            proposals = refined.reshape(b, r, 4)
            prop_valid = tgts.label_weights > 0

    if model.with_mask:
        # single mask head on the LAST stage's positives with the
        # relayed bbox feature (feature relay) + global context
        m = cfg.num_mask_rois
        pos_rois5 = last_rois5.reshape(b, r, 5)[:, :m].reshape(-1, 5)
        pos_w = last_tgts.bbox_weights[:, :m].reshape(-1)
        pos_gt = last_tgts.pos_gt_inds[:, :m].reshape(-1)
        pos_labels = last_tgts.labels[:, :m].reshape(-1)
        mfeats = mask_extractor(feats[:4], pos_rois5)
        mfeats = mfeats + glbctx[
            pos_rois5[:, 0].astype(jnp.int32)][:, None, None, :]
        pos_embed = relayed.reshape(b, r, -1)[:, :m].reshape(
            b * m, -1)
        relay_map = model.apply(variables, pos_embed,
                                method=SCNet.forward_relay)
        mfeats = mfeats + relay_map.astype(mfeats.dtype)
        cls_idx = jnp.clip(pos_labels, 0, model.num_classes - 1)
        mask_pred = model.apply(
            variables, mfeats, cls_idx, 0,
            method=SCNet.forward_mask_for_labels_stage)
        mt = mask_targets(
            pos_rois5, pos_gt,
            resolve_gt_masks(batch, img_w // cfg.mask_gt_stride),
            cfg.mask_size, gt_stride=cfg.mask_gt_stride)
        losses["loss_mask"] = mask_head_loss(mask_pred, mt, pos_labels,
                                             pos_w)

    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def scnet_simple_test(
    model: SCNet,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    loss_cls_per_stage: Sequence,
    cfg: DetTestCfg = DetTestCfg(),
) -> Dict[str, jnp.ndarray]:
    """``scnet_roi_head.py:314-486``: cascade-averaged scores with the
    glbctx fusion at every stage; the single mask head reads the relay
    of the last stage's embedding at the detection boxes."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=SCNet.extract_feat)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=SCNet.forward_rpn)
    gen = make_anchor_generator()
    anchors_np = gen.grid_anchors(fpn_shapes((img_h, img_w)))
    proposals, _, prop_valid = rpn_proposals(
        cls_scores, bbox_preds, [jnp.asarray(a) for a in anchors_np],
        (img_h, img_w), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)
    _, glbctx = model.apply(variables, feats[-1],
                            method=SCNet.forward_glbctx)

    extractor = SingleRoIExtractor((7, 7))
    p = proposals.shape[1]
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
    rois = proposals
    stage_scores = []
    for stage in range(model.num_stages):
        rois5 = jnp.concatenate(
            [batch_idx[:, None], rois.reshape(-1, 4)], axis=1)
        roi_feats = extractor(feats[:4], rois5)
        roi_feats = roi_feats + glbctx[
            rois5[:, 0].astype(jnp.int32)][:, None, None, :]
        cls_score, bbox_pred, _ = model.apply(
            variables, roi_feats, stage,
            method=SCNet.forward_bbox_stage)
        lc = loss_cls_per_stage[stage]
        if getattr(lc, "custom_activation", False):
            stage_scores.append(lc.get_activation(cls_score))
        else:
            stage_scores.append(jax.nn.softmax(
                cls_score.astype(jnp.float32), -1))
        fg_label = cls_score[:, :-1].argmax(-1)
        pred4 = _select_pred(bbox_pred, fg_label, model.num_classes,
                             model.reg_class_agnostic)
        if stage < model.num_stages - 1:
            rois = _refine(rois.reshape(-1, 4), pred4, (img_h, img_w),
                           model.stage_stds[stage]).reshape(b, p, 4)

    avg_scores = sum(stage_scores) / len(stage_scores)
    avg_scores = avg_scores.reshape(b, p, -1)
    avg_scores = jnp.where(prop_valid[..., None], avg_scores, 0.0)
    final_boxes = _refine(rois.reshape(-1, 4), pred4, (img_h, img_w),
                          model.stage_stds[-1]).reshape(b, p, 4)

    def _one(bx, sc):
        return multiclass_nms(bx, sc, cfg.score_thr, cfg.nms_iou,
                              cfg.max_per_img)

    dets, scores, labels, det_valid = jax.vmap(_one)(final_boxes,
                                                     avg_scores)
    out = {"boxes": dets, "scores": scores, "labels": labels,
           "valid": det_valid}

    if model.with_mask:
        k = dets.shape[1]
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), k)
        det_rois = jnp.concatenate(
            [bidx[:, None], dets.reshape(-1, 4)], axis=1)
        # relay from the LAST bbox stage on the detection boxes
        det_feats7 = extractor(feats[:4], det_rois)
        det_feats7 = det_feats7 + glbctx[
            det_rois[:, 0].astype(jnp.int32)][:, None, None, :]
        _, _, det_embed = model.apply(
            variables, det_feats7, model.num_stages - 1,
            method=SCNet.forward_bbox_stage)
        relay_map = model.apply(variables, det_embed,
                                method=SCNet.forward_relay)
        mask_extractor = SingleRoIExtractor((14, 14))
        mfeats = mask_extractor(feats[:4], det_rois)
        mfeats = mfeats + glbctx[
            det_rois[:, 0].astype(jnp.int32)][:, None, None, :]
        mfeats = mfeats + relay_map.astype(mfeats.dtype)
        cls_idx = jnp.clip(labels.reshape(-1), 0, model.num_classes - 1)
        sel = model.apply(variables, mfeats, cls_idx, 0,
                          method=SCNet.forward_mask_for_labels_stage)
        probs = jax.nn.sigmoid(sel.astype(jnp.float32))
        out["masks"] = probs.reshape(b, k, *probs.shape[1:])
    return out
