"""HTC (Hybrid Task Cascade), static-shape.

Rebuild of the reference HTC family
(``mmdet/models/detectors/htc.py``, roi head
``mmdet/models/roi_heads/htc_roi_head.py``, mask head
``mmdet/models/roi_heads/mask_heads/htc_mask_head.py``, semantic head
``mmdet/models/roi_heads/mask_heads/fused_semantic_head.py``, configs
``configs/htc/htc*_r50_fpn_1x_coco.py``): a 3-stage cascade with

1. INTERLEAVED execution (``htc_roi_head.py:291-313``): each stage's
   mask branch trains on the boxes REFINED by that stage's bbox branch
   (re-assigned and re-sampled at the stage IoU),
2. MASK INFORMATION FLOW (``htc_mask_head.py:22-39``): stage i's mask
   trunk receives the sum of all previous stages' trunk features
   through a 1x1 conv residual, and
3. an optional multi-level FUSED SEMANTIC branch whose pooled features
   are added to the bbox/mask RoI features and which carries a 0.2x CE
   segmentation loss (``fused_semantic_head.py``).
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
)
from iif_tpu.detection.detector import (
    DetTestCfg,
    DetTrainCfg,
    fpn_shapes,
    make_anchor_generator,
    resolve_gt_masks,
)
from iif_tpu.detection.mask_head import (
    FCNMaskHead,
    mask_head_loss,
    mask_targets,
)
from iif_tpu.detection.roi_extractor import SingleRoIExtractor
from iif_tpu.detection.rpn import rpn_loss, rpn_proposals
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms


class HTCMaskHead(FCNMaskHead):
    """FCN mask head with the information-flow residual
    (``htc_mask_head.py``: with_conv_res=True)."""

    def setup(self):
        super().setup()
        self.conv_res = nn.Conv(self.conv_out_channels, (1, 1),
                                name="conv_res")

    def trunk(self, x: jnp.ndarray,
              res_feat: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """conv stack only; optional previous-stage residual."""
        if res_feat is not None:
            x = x + nn.relu(self.conv_res(res_feat))
        for conv in self.convs:
            x = nn.relu(conv(x))
        return x

    def logits_for_labels_from_trunk(self, trunk_feat: jnp.ndarray,
                                     labels: jnp.ndarray) -> jnp.ndarray:
        feats = nn.relu(self.upsample(trunk_feat))
        params = self.conv_logits.variables["params"]
        kernel = params["kernel"][0, 0]
        sel = kernel.T[labels]
        out = jnp.einsum("rhwc,rc->rhw", feats, sel.astype(feats.dtype))
        if "bias" in params:
            out = out + params["bias"][labels][:, None, None]
        return out


class FusedSemanticHead(nn.Module):
    """``fused_semantic_head.py:13-110``: per-level 1x1 laterals fused
    at the stride-8 level, 4x 3x3 convs, then 1x1 seg logits and 1x1
    embedding outputs."""
    num_classes: int = 183
    num_ins: int = 5
    fusion_level: int = 1
    num_convs: int = 4
    channels: int = 256

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        target = None
        fused = 0.0
        th, tw = feats[self.fusion_level].shape[1:3]
        for i in range(self.num_ins):
            lat = nn.Conv(self.channels, (1, 1),
                          name=f"lateral_{i}")(feats[i])
            if i != self.fusion_level:
                lat = jax.image.resize(
                    lat, (lat.shape[0], th, tw, lat.shape[-1]),
                    "bilinear")
            fused = fused + lat
        x = fused
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                name=f"conv_{i}")(x))
        seg = nn.Conv(self.num_classes, (1, 1), name="conv_logits")(x)
        embedding = nn.Conv(self.channels, (1, 1), name="conv_embedding")(x)
        return seg, embedding


class HTC(CascadeMaskRCNN):
    """HTC detector. ``with_semantic=False`` matches the reference's
    ``htc_without_semantic`` configs; True adds the fused semantic
    branch (COCO-stuff 183 classes by default)."""
    with_semantic: bool = False
    semantic_classes: int = 183

    def setup(self):
        super().setup()
        # shadow the plain cascade mask heads with HTC flow heads
        if self.with_mask:
            self.htc_mask_heads = [
                HTCMaskHead(self.num_classes,
                            predictor=self.mask_predictor,
                            temperature=self.mask_temperature,
                            name=f"htc_mask_head_{i}")
                for i in range(self.num_stages)]
        if self.with_semantic:
            self.semantic_head = FusedSemanticHead(
                self.semantic_classes, name="semantic_head")

    def forward_semantic(self, feats):
        return self.semantic_head(feats)

    def forward_mask_trunk(self, roi_feats, stage: int, res_feat=None):
        return self.htc_mask_heads[stage].trunk(roi_feats, res_feat)

    def forward_mask_logits(self, trunk_feat, labels, stage: int):
        return self.htc_mask_heads[stage].logits_for_labels_from_trunk(
            trunk_feat, labels)

    def __call__(self, images, train: bool = False):
        feats = self.extract_feat(images, train=train)
        rpn_out = self.rpn_head(feats)
        c = feats[0].shape[-1]
        d7 = jnp.zeros((1, 7, 7, c), feats[0].dtype)
        d14 = jnp.zeros((1, 14, 14, c), feats[0].dtype)
        for i in range(self.num_stages):
            self.bbox_heads[i](d7)
            if self.with_mask:
                # touch every parameterized layer: the standard path
                # creates convs/upsample/conv_logits, the flow path
                # creates conv_res
                self.htc_mask_heads[i](d14)
                self.htc_mask_heads[i].trunk(d14, d14)
        if self.with_semantic:
            self.semantic_head(feats)
        return rpn_out


def htc_loss(
    model: HTC,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    loss_cls_per_stage: Sequence,
    cfg: DetTrainCfg = DetTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``htc_roi_head.py:205-329`` forward_train (interleaved=True,
    mask_info_flow=True) in one static-shape program."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    keys = jax.random.split(key, 2 * model.num_stages + 1)

    feats, mutated = model.apply(
        variables, images, True, method=HTC.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=HTC.forward_rpn)

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

    semantic_feat = None
    if model.with_semantic and "gt_semantic_seg" in batch:
        seg_pred, semantic_feat = model.apply(
            variables, feats, method=HTC.forward_semantic)
        seg_gt = batch["gt_semantic_seg"]            # (B, h, w) int
        logp = jax.nn.log_softmax(seg_pred.astype(jnp.float32), -1)
        valid_px = seg_gt != 255
        gt_c = jnp.clip(seg_gt, 0, model.semantic_classes - 1)
        ce = -jnp.take_along_axis(logp, gt_c[..., None], axis=-1)[..., 0]
        losses["loss_semantic_seg"] = 0.2 * (
            (ce * valid_px).sum() / jnp.maximum(valid_px.sum(), 1.0))

    ext_kind = "ml" if getattr(cfg, "roi_ext", "flat") == "ml" else False
    extractor = SingleRoIExtractor((7, 7), use_pallas=ext_kind)
    mask_extractor = SingleRoIExtractor((14, 14), use_pallas=ext_kind)
    sem_extractor7 = SingleRoIExtractor((7, 7), featmap_strides=(8,))
    sem_extractor14 = SingleRoIExtractor((14, 14), featmap_strides=(8,))
    r = cfg.rcnn_num_samples
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)
    gt_masks_dec = (resolve_gt_masks(batch, img_w // cfg.mask_gt_stride)
                    if model.with_mask else None)

    def _sem_roi(rois5, size_extractor):
        """Pool the fused stride-8 semantic feature for these rois
        (semantic_roi_extractor: single level, out_size matching)."""
        return size_extractor([semantic_feat], rois5)

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
        if semantic_feat is not None:
            roi_feats = roi_feats + _sem_roi(rois5, sem_extractor7)
        cls_score, bbox_pred, _ = model.apply(
            variables, roi_feats, stage, method=HTC.forward_bbox_stage)

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

        # INTERLEAVED: refine this stage's rois, re-assign at the same
        # IoU, and train the mask branch on the refined positives
        refined = _refine(tgts.rois.reshape(-1, 4),
                          jax.lax.stop_gradient(pred4),
                          (img_h, img_w), stds)
        proposals = refined.reshape(b, r, 4)
        prop_valid = tgts.label_weights > 0

        if model.with_mask:
            mtgts = bbox_targets(
                keys[model.num_stages + 1 + stage], proposals, prop_valid,
                batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"],
                model.num_classes, num_samples=r,
                pos_fraction=cfg.rcnn_pos_fraction,
                pos_iou_thr=iou, neg_iou_thr=iou, min_pos_iou=iou,
                add_gt_as_proposals=False)
            m = cfg.num_mask_rois
            mrois5 = jnp.concatenate(
                [batch_idx[:, None], mtgts.rois.reshape(-1, 4)],
                axis=1).reshape(b, r, 5)[:, :m].reshape(-1, 5)
            pos_w = mtgts.bbox_weights[:, :m].reshape(-1)
            pos_gt = mtgts.pos_gt_inds[:, :m].reshape(-1)
            pos_labels = mtgts.labels[:, :m].reshape(-1)
            mfeats = mask_extractor(feats[:4], mrois5)
            if semantic_feat is not None:
                mfeats = mfeats + _sem_roi(mrois5, sem_extractor14)
            # mask information flow: chain previous heads' trunks
            last_feat = None
            for i in range(stage):
                last_feat = model.apply(
                    variables, mfeats, i, last_feat,
                    method=HTC.forward_mask_trunk)
            trunk = model.apply(variables, mfeats, stage, last_feat,
                                method=HTC.forward_mask_trunk)
            cls_idx = jnp.clip(pos_labels, 0, model.num_classes - 1)
            mask_pred = model.apply(variables, trunk, cls_idx, stage,
                                    method=HTC.forward_mask_logits)
            mt = mask_targets(mrois5, pos_gt, gt_masks_dec,
                              cfg.mask_size, gt_stride=cfg.mask_gt_stride)
            losses[f"s{stage}.loss_mask"] = sw * mask_head_loss(
                mask_pred, mt, pos_labels, pos_w)

    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def htc_simple_test(
    model: HTC,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    loss_cls_per_stage: Sequence,
    cfg: DetTestCfg = DetTestCfg(),
) -> Dict[str, jnp.ndarray]:
    """``htc_roi_head.py:330-503`` simple_test: cascade-averaged scores,
    mask preds averaged over stages WITH the info flow chain."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False, method=HTC.extract_feat)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=HTC.forward_rpn)
    gen = make_anchor_generator()
    anchors_np = gen.grid_anchors(fpn_shapes((img_h, img_w)))
    proposals, _, prop_valid = rpn_proposals(
        cls_scores, bbox_preds, [jnp.asarray(a) for a in anchors_np],
        (img_h, img_w), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)

    semantic_feat = None
    if model.with_semantic:
        _, semantic_feat = model.apply(
            variables, feats, method=HTC.forward_semantic)

    test_ext = "ml" if getattr(cfg, "roi_ext", "ml") == "ml" else False
    extractor = SingleRoIExtractor((7, 7), use_pallas=test_ext)
    sem_extractor7 = SingleRoIExtractor((7, 7), featmap_strides=(8,))
    sem_extractor14 = SingleRoIExtractor((14, 14), featmap_strides=(8,))
    p = proposals.shape[1]
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
    rois = proposals
    stage_scores = []
    for stage in range(model.num_stages):
        rois5 = jnp.concatenate(
            [batch_idx[:, None], rois.reshape(-1, 4)], axis=1)
        roi_feats = extractor(feats[:4], rois5)
        if semantic_feat is not None:
            roi_feats = roi_feats + sem_extractor7([semantic_feat], rois5)
        cls_score, bbox_pred, _ = model.apply(
            variables, roi_feats, stage, method=HTC.forward_bbox_stage)
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
        mask_extractor = SingleRoIExtractor((14, 14), use_pallas=test_ext)
        mfeats = mask_extractor(feats[:4], det_rois)
        if semantic_feat is not None:
            mfeats = mfeats + sem_extractor14([semantic_feat], det_rois)
        cls_idx = jnp.clip(labels.reshape(-1), 0, model.num_classes - 1)
        probs = 0.0
        last_feat = None
        for stage in range(model.num_stages):
            trunk = model.apply(variables, mfeats, stage, last_feat,
                                method=HTC.forward_mask_trunk)
            sel = model.apply(variables, trunk, cls_idx, stage,
                              method=HTC.forward_mask_logits)
            probs = probs + jax.nn.sigmoid(sel.astype(jnp.float32))
            last_feat = trunk
        probs = probs / model.num_stages
        out["masks"] = probs.reshape(b, k, *probs.shape[1:])
    return out
