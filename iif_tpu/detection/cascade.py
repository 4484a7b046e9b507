"""Cascade (Mask-)RCNN — 3-stage refinement with IIF + FASA heads.

Rebuild of ``mmdet/models/roi_heads/cascade_roi_head.py`` (+ detector
``cascade_rcnn.py``, FASA cascade variant ``cascade_fasa_roi_head.py:7-54``
and the per-stage ``Shared2FCFASABBoxHead`` of
``configs/fasa/fasa_iif_cascade_r101_rfs_cos_norm_4x4_2x.py``):
per-stage IoU thresholds (0.5/0.6/0.7), per-stage delta stds, stage loss
weights (1, 0.5, 0.25), inter-stage ``refine_bboxes`` (decode the previous
stage's label-selected regression to feed the next), mask heads per stage,
and test-time class scores averaged over stages through the custom (IIF)
activation (``cascade_roi_head.py:355-366``).

FASA in the cascade is PER STAGE, exactly like the reference where each
stage owns a ``Shared2FCFASABBoxHead`` with its own EMA feature stats,
sampling probs and cum-loss counters: ``fasa_states`` is a tuple of
``FasaState`` (one per stage), each updated from that stage's positive
RoI embeddings, each contributing a stage-weighted aug CE through that
stage's classifier.
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
    Shared2FCBBoxHead,
    bbox_targets,
)
from iif_tpu.detection.mask_head import FCNMaskHead, mask_head_loss, mask_targets
from iif_tpu.detection.necks import FPN
from iif_tpu.detection.roi_extractor import SingleRoIExtractor
from iif_tpu.detection.rpn import RPNHead, rpn_loss, rpn_proposals
from iif_tpu.detection.detector import (
    DetTrainCfg, DetTestCfg, _DEPTH_LAYERS, fpn_shapes,
    make_anchor_generator, normalize_if_uint8, resolve_gt_masks)
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms

STAGE_IOUS = (0.5, 0.6, 0.7)
STAGE_STDS = ((0.1, 0.1, 0.2, 0.2), (0.05, 0.05, 0.1, 0.1),
              (0.033, 0.033, 0.067, 0.067))
STAGE_WEIGHTS = (1.0, 0.5, 0.25)


class CascadeMaskRCNN(nn.Module):
    num_classes: int = 1203
    depth: int = 101
    # 'resnet' | 'detectors' (DetectoRS SAC backbone, detectors_rs.py)
    backbone_type: str = "resnet"
    num_stages: int = 3
    with_mask: bool = True
    cls_predictor: str = "linear"
    mask_predictor: str = "conv"
    cls_temperature: float = 8.0      # NormedLinear temp (see detector.py)
    mask_temperature: float = 20.0
    frozen_stages: int = 1
    norm_eval: bool = True            # reference config: norm_eval=True
    backbone_remat: bool = False      # jax.checkpoint residual blocks
    iif_weights: tuple = ()
    compute_dtype: object = None      # e.g. jnp.bfloat16 for backbone/FPN/RPN
    # the reference FASA cascade trains class-SPECIFIC regressors
    # (reg_class_agnostic=False in fasa_iif_cascade_*.py); plain mmdet
    # cascade uses True
    reg_class_agnostic: bool = True
    cls_init: tuple = ("normal", 0.01)
    stage_ious: tuple = STAGE_IOUS
    stage_stds: tuple = STAGE_STDS    # fasa_iif_cascade uses 0.33 in s3
    stage_weights: tuple = STAGE_WEIGHTS

    def setup(self):
        if self.backbone_type == "detectors":
            from iif_tpu.models.detectors_resnet import DetectoRSResNet

            self.backbone = DetectoRSResNet(
                depth=self.depth, frozen_stages=self.frozen_stages,
                norm_eval=self.norm_eval, dtype=self.compute_dtype,
                name="backbone")
        else:
            layers, block = _DEPTH_LAYERS[self.depth]
            self.backbone = ResNet(layers=layers, block=block,
                                   frozen_stages=self.frozen_stages,
                                   norm_eval=self.norm_eval,
                                   remat=self.backbone_remat,
                                   dtype=self.compute_dtype,
                                   name="backbone")
        neck_cls = nn.remat(FPN) if self.backbone_remat else FPN
        self.neck = neck_cls(out_channels=256, num_outs=5,
                             dtype=self.compute_dtype, name="neck")
        self.rpn_head = RPNHead(num_anchors=3, dtype=self.compute_dtype,
                                name="rpn_head")
        self.bbox_heads = [
            Shared2FCBBoxHead(self.num_classes,
                              reg_class_agnostic=self.reg_class_agnostic,
                              cls_predictor=self.cls_predictor,
                              cls_temperature=self.cls_temperature,
                              iif_weights=self.iif_weights,
                              cls_init=tuple(self.cls_init),
                              name=f"bbox_head_{i}")
            for i in range(self.num_stages)]
        if self.with_mask:
            self.mask_heads = [
                FCNMaskHead(self.num_classes, predictor=self.mask_predictor,
                            temperature=self.mask_temperature,
                            name=f"mask_head_{i}")
                for i in range(self.num_stages)]

    def extract_feat(self, images, train: bool = False):
        return self.neck(self.backbone(normalize_if_uint8(images),
                                       train=train, return_features=True))

    def forward_rpn(self, feats):
        return self.rpn_head(feats)

    def forward_bbox_stage(self, roi_feats, stage: int):
        return self.bbox_heads[stage](roi_feats)

    def forward_mask_stage(self, roi_feats, stage: int):
        return self.mask_heads[stage](roi_feats)

    def forward_mask_for_labels_stage(self, roi_feats, labels, stage: int):
        return self.mask_heads[stage].logits_for_labels(roi_feats, labels)

    def forward_cls_only_stage(self, embedding, stage: int):
        return self.bbox_heads[stage].cls_only(embedding)

    def __call__(self, images, train: bool = False):
        feats = self.extract_feat(images, train=train)
        rpn_out = self.rpn_head(feats)
        c = feats[0].shape[-1]
        d7 = jnp.zeros((1, 7, 7, c), feats[0].dtype)
        d14 = jnp.zeros((1, 14, 14, c), feats[0].dtype)
        for i in range(self.num_stages):
            self.bbox_heads[i](d7)
            if self.with_mask:
                self.mask_heads[i](d14)
        return rpn_out


def _select_pred(bbox_pred: jnp.ndarray, labels: jnp.ndarray,
                 num_classes: int, reg_class_agnostic: bool) -> jnp.ndarray:
    """(R, C*4) -> (R, 4) by label channel (class-specific regressors);
    background labels clamp to 0 — their rows carry zero loss weight and,
    in refine, mmdet's ``regress_by_class`` gathers by the clamped label."""
    if reg_class_agnostic:
        return bbox_pred
    pred = bbox_pred.reshape(-1, num_classes, 4)
    cls_idx = jnp.clip(labels, 0, num_classes - 1)
    return jnp.take_along_axis(
        pred, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]


def _refine(rois: jnp.ndarray, bbox_pred4: jnp.ndarray,
            img_shape, stds) -> jnp.ndarray:
    """Decode a (R, 4) per-roi regression (already label-selected)."""
    return delta2bbox(rois, bbox_pred4, (0, 0, 0, 0), stds,
                      max_shape=img_shape)


def cascade_loss(
    model: CascadeMaskRCNN,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    loss_cls_per_stage: Sequence,     # e.g. 3 x DetIIFLoss
    cfg: DetTrainCfg = DetTrainCfg(),
    fasa_states: Optional[Tuple] = None,   # tuple of FasaState, per stage
    fasa_cfg: Optional[Dict[str, float]] = None,
    epoch: int = 0,
    mesh=None,                     # Mesh with a 'spatial' axis -> H-sharded
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    from iif_tpu.parallel.mesh import constrain_spatial_image, gather_spatial

    images = constrain_spatial_image(batch["image"], mesh)
    b, img_h, img_w, _ = images.shape
    keys = jax.random.split(key, 2 * model.num_stages + 1)

    feats, mutated = model.apply(
        variables, images, True, method="extract_feat",
        mutable=["batch_stats"])
    feats = gather_spatial(feats, mesh)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=CascadeMaskRCNN.forward_rpn)

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
    ext_kind = "ml" if getattr(cfg, "roi_ext", "flat") == "ml" else False
    extractor = SingleRoIExtractor((7, 7), use_pallas=ext_kind)
    mask_extractor = SingleRoIExtractor((14, 14), use_pallas=ext_kind)
    r = cfg.rcnn_num_samples
    fcfg = fasa_cfg or {}
    new_fasa: List = []

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
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)
        rois5 = jnp.concatenate(
            [batch_idx[:, None], tgts.rois.reshape(-1, 4)], axis=1)
        roi_feats = extractor(feats[:4], rois5)
        cls_score, bbox_pred, embedding = model.apply(
            variables, roi_feats, stage,
            method=CascadeMaskRCNN.forward_bbox_stage)

        labels = tgts.labels.reshape(-1)
        lw = tgts.label_weights.reshape(-1)
        bw = tgts.bbox_weights.reshape(-1)
        losses[f"s{stage}.loss_cls"] = sw * loss_cls_per_stage[stage](
            cls_score, labels, weight=lw, avg_factor=lw.sum())

        # FASA per-stage: EMA stats from this stage's positives, aug CE
        # through this stage's classifier (stage-weighted like every
        # other head loss in CascadeRoIHead)
        if fasa_states is not None:
            from iif_tpu.detection.fasa import fasa_aug_loss, fasa_update

            st = fasa_update(fasa_states[stage], embedding, labels, bw,
                             decay_ratio=fcfg.get("decay_ratio", 0.1))
            if epoch >= 1:
                losses[f"s{stage}.loss_cls"] = (
                    losses[f"s{stage}.loss_cls"] + sw * fasa_aug_loss(
                        st, keys[model.num_stages + 1 + stage],
                        lambda e, _s=stage: model.apply(
                            variables, e, _s,
                            method=CascadeMaskRCNN.forward_cls_only_stage),
                        loss_cls_per_stage[stage],
                        loss_aug_weight=fcfg.get("loss_aug_weight", 0.1)))
            new_fasa.append(st)

        # re-encode regression targets with this stage's stds: decode the
        # std-(0.1,0.2)-coded targets back to boxes, re-encode
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

        if model.with_mask:
            m = cfg.num_mask_rois
            pos_rois5 = rois5.reshape(b, r, 5)[:, :m].reshape(-1, 5)
            pos_w = tgts.bbox_weights[:, :m].reshape(-1)
            pos_gt = tgts.pos_gt_inds[:, :m].reshape(-1)
            pos_labels = tgts.labels[:, :m].reshape(-1)
            mfeats = mask_extractor(feats[:4], pos_rois5)
            cls_idx = jnp.clip(pos_labels, 0, model.num_classes - 1)
            mask_pred = model.apply(
                variables, mfeats, cls_idx, stage,
                method=CascadeMaskRCNN.forward_mask_for_labels_stage)
            mt = mask_targets(
                pos_rois5, pos_gt,
                resolve_gt_masks(batch, img_w // cfg.mask_gt_stride),
                cfg.mask_size, gt_stride=cfg.mask_gt_stride)
            losses[f"s{stage}.loss_mask"] = sw * mask_head_loss(
                mask_pred, mt, pos_labels, pos_w)

        # refine proposals for the next stage (label-selected regression,
        # mmdet refine_bboxes/regress_by_class)
        if stage < model.num_stages - 1:
            refined = _refine(tgts.rois.reshape(-1, 4),
                              jax.lax.stop_gradient(pred4),
                              (img_h, img_w), stds)
            proposals = refined.reshape(b, r, 4)
            prop_valid = tgts.label_weights > 0

    total = sum(losses.values())
    aux: Dict[str, Any] = {"batch_stats": mutated.get("batch_stats", {})}
    if fasa_states is not None:
        aux["fasa_state"] = tuple(new_fasa)
    return total, losses, aux


def cascade_simple_test(
    model: CascadeMaskRCNN,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    loss_cls_per_stage: Sequence,
    cfg: DetTestCfg = DetTestCfg(),
) -> Dict[str, jnp.ndarray]:
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method="extract_feat")
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=CascadeMaskRCNN.forward_rpn)
    gen = make_anchor_generator()
    anchors_np = gen.grid_anchors(fpn_shapes((img_h, img_w)))
    proposals, _, prop_valid = rpn_proposals(
        cls_scores, bbox_preds, [jnp.asarray(a) for a in anchors_np],
        (img_h, img_w), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)

    test_ext = "ml" if getattr(cfg, "roi_ext", "ml") == "ml" else False
    extractor = SingleRoIExtractor((7, 7), use_pallas=test_ext)
    p = proposals.shape[1]
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
    rois = proposals
    stage_scores = []
    for stage in range(model.num_stages):
        rois5 = jnp.concatenate(
            [batch_idx[:, None], rois.reshape(-1, 4)], axis=1)
        roi_feats = extractor(feats[:4], rois5)
        cls_score, bbox_pred, _ = model.apply(
            variables, roi_feats, stage,
            method=CascadeMaskRCNN.forward_bbox_stage)
        lc = loss_cls_per_stage[stage]
        if getattr(lc, "custom_activation", False):
            stage_scores.append(lc.get_activation(cls_score))
        else:
            stage_scores.append(jax.nn.softmax(
                cls_score.astype(jnp.float32), -1))
        # label-selected regression: mmdet test refines by the argmax
        # foreground class (cascade_roi_head simple_test bbox_label)
        fg_label = cls_score[:, :-1].argmax(-1)
        pred4 = _select_pred(bbox_pred, fg_label, model.num_classes,
                             model.reg_class_agnostic)
        if stage < model.num_stages - 1:
            rois = _refine(rois.reshape(-1, 4), pred4, (img_h, img_w),
                           model.stage_stds[stage]).reshape(b, p, 4)

    avg_scores = sum(stage_scores) / len(stage_scores)   # (B*P, C+1)
    avg_scores = avg_scores.reshape(b, p, -1)
    avg_scores = jnp.where(prop_valid[..., None], avg_scores, 0.0)
    final_boxes = _refine(rois.reshape(-1, 4), pred4,
                          (img_h, img_w),
                          model.stage_stds[-1]).reshape(b, p, 4)

    def _one(bx, sc):
        if getattr(cfg, "nms_kind", "nms") == "fast":
            from iif_tpu.ops.nms import fast_nms

            return fast_nms(bx, sc, cfg.score_thr, cfg.nms_iou,
                            max_per_img=cfg.max_per_img)
        return multiclass_nms(bx, sc, cfg.score_thr, cfg.nms_iou,
                              cfg.max_per_img)

    dets, scores, labels, det_valid = jax.vmap(_one)(final_boxes, avg_scores)
    out = {"boxes": dets, "scores": scores, "labels": labels,
           "valid": det_valid}

    if model.with_mask:
        k = dets.shape[1]
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), k)
        det_rois = jnp.concatenate(
            [bidx[:, None], dets.reshape(-1, 4)], axis=1)
        mask_extractor = SingleRoIExtractor((14, 14), use_pallas=test_ext)
        mfeats = mask_extractor(feats[:4], det_rois)
        # average mask probs over stages (mmdet cascade test behaviour),
        # computing only each detection's predicted-class channel
        cls_idx = jnp.clip(labels.reshape(-1), 0, model.num_classes - 1)
        probs = 0.0
        for stage in range(model.num_stages):
            sel = model.apply(
                variables, mfeats, cls_idx, stage,
                method=CascadeMaskRCNN.forward_mask_for_labels_stage)
            probs = probs + jax.nn.sigmoid(sel.astype(jnp.float32))
        probs = probs / model.num_stages
        out["masks"] = probs.reshape(b, k, *probs.shape[1:])
    return out
