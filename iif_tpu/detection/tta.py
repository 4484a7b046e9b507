"""Test-time augmentation for detection.

Rebuild of ``MultiScaleFlipAug`` (``pipelines/test_time_aug.py:11``) +
``core/post_processing/merge_augs.py`` + the two-stage aug-test mixins
(``test_mixins.py:138-176,281-311``, ``cascade_roi_head.py:458-530``):

- ``maskrcnn_aug_test`` / ``cascade_aug_test`` — the reference-faithful
  path: per-view RPN proposals merged with NMS in original coords, the
  ONE merged set re-scored through the (cascade) bbox head on every
  view, decoded boxes+scores averaged elementwise, a single multiclass
  NMS; masks averaged in sigmoid space over views (and cascade stages).
  TPU design: every view shares one padded canvas, so the whole thing is
  one jitted program with the view axis as the batch axis.
- ``merge_aug_detections`` — a cheaper detection-level fusion (union +
  class-aware NMS) kept for models without a re-scorable head.
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from iif_tpu.ops.nms import batched_nms


def flip_boxes(boxes: np.ndarray, width: float) -> np.ndarray:
    out = boxes.copy()
    out[..., 0] = width - boxes[..., 2]
    out[..., 2] = width - boxes[..., 0]
    return out


def merge_aug_detections(
    per_view: List[Dict[str, np.ndarray]],
    view_meta: List[Dict],
    orig_shape: Tuple[int, int],
    iou_thr: float = 0.5,
    max_per_img: int = 100,
) -> Dict[str, np.ndarray]:
    """Fuse per-view fixed-shape detections.

    per_view: list of {boxes (K,4), scores (K,), labels (K,), valid (K,)}
      in *view* coordinates.
    view_meta: per view {scale_factor: float, flip: bool}.
    """
    h, w = orig_shape
    boxes_all, scores_all, labels_all = [], [], []
    for out, meta in zip(per_view, view_meta):
        boxes = np.asarray(out["boxes"], np.float64)
        if meta.get("flip"):
            boxes = flip_boxes(boxes, w * meta["scale_factor"])
        boxes = boxes / meta["scale_factor"]
        valid = np.asarray(out["valid"], bool)
        boxes_all.append(boxes[valid])
        scores_all.append(np.asarray(out["scores"])[valid])
        labels_all.append(np.asarray(out["labels"])[valid])
    if not boxes_all or sum(len(b) for b in boxes_all) == 0:
        return {"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                "labels": np.zeros(0, np.int64)}
    boxes = np.concatenate(boxes_all).astype(np.float32)
    scores = np.concatenate(scores_all).astype(np.float32)
    labels = np.concatenate(labels_all).astype(np.int64)

    keep, order = jax.jit(batched_nms, static_argnames=())(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
        iou_thr)
    keep = np.asarray(keep)
    order = np.asarray(order)
    sel = order[keep][:max_per_img]
    return {"boxes": boxes[sel], "scores": scores[sel],
            "labels": labels[sel]}


def multi_scale_flip_views(scales: Sequence[Tuple[int, int]],
                           flip: bool = True) -> List[Dict]:
    """The view grid of MultiScaleFlipAug: each scale x {orig, flipped}."""
    views = []
    for s in scales:
        views.append({"scale": tuple(s), "flip": False})
        if flip:
            views.append({"scale": tuple(s), "flip": True})
    return views


# --------------------------------------------------------------------------
# Reference-faithful two-stage aug-test (``test_mixins.py:138-176,281-311``
# + ``merge_augs.py``): merge per-view RPN proposals with NMS in original
# coords, re-score the ONE merged proposal set through the bbox head on
# every view, average decoded boxes+scores elementwise, single
# multiclass NMS; mask logits averaged in sigmoid space across views.
#
# TPU redesign: all V views share one padded canvas, so the whole thing is
# a single jitted program with the view axis as a batch axis — backbone,
# RPN, RoI heads all batch (V, ...); per-view flip/scale mapping is
# branchless jnp.where arithmetic. One compile, no host round-trips.
# --------------------------------------------------------------------------


def _boxes_to_view(boxes, sf, flip, content_w):
    """Original-image boxes -> view coords (resize by sf, then hflip within
    the resized content width). boxes (..., 4); sf/flip/content_w must
    broadcast against boxes[..., 0] (i.e. one rank below boxes)."""
    x1, y1 = boxes[..., 0] * sf, boxes[..., 1] * sf
    x2, y2 = boxes[..., 2] * sf, boxes[..., 3] * sf
    fx1 = content_w - x2
    fx2 = content_w - x1
    x1 = jnp.where(flip, fx1, x1)
    x2 = jnp.where(flip, fx2, x2)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def _boxes_from_view(boxes, sf, flip, content_w):
    """Inverse of `_boxes_to_view` (unflip, then divide by sf)."""
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    fx1 = content_w - x2
    fx2 = content_w - x1
    x1 = jnp.where(flip, fx1, x1)
    x2 = jnp.where(flip, fx2, x2)
    return jnp.stack([x1, y1, x2, y2], axis=-1) / sf[..., None]


def _merged_aug_proposals(model, variables, images, sf, flips, cw, cfg):
    """Per-view RPN (view axis = batch axis) + ``merge_aug_proposals``:
    map every view's proposals back to original coords, one
    class-agnostic NMS over the union, keep the top max_per_img.
    Returns (fpn feats, merged (R,4) orig-coords proposals, valid (R,))."""
    from iif_tpu.detection.detector import fpn_shapes, make_anchor_generator
    from iif_tpu.detection.rpn import rpn_proposals
    from iif_tpu.ops.nms import nms

    v, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=type(model).extract_feat)
    cls_scores, bbox_preds = model.apply(variables, feats,
                                         method=type(model).forward_rpn)
    gen = make_anchor_generator()
    anchors_np = gen.grid_anchors(fpn_shapes((img_h, img_w)))
    proposals, prop_scores, prop_valid = rpn_proposals(
        cls_scores, bbox_preds, [jnp.asarray(a) for a in anchors_np],
        (img_h, img_w), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)

    orig_props = _boxes_from_view(proposals, sf[:, None],
                                  flips[:, None], cw[:, None])
    flat_props = orig_props.reshape(-1, 4)
    flat_scores = jnp.where(prop_valid.reshape(-1),
                            prop_scores.reshape(-1), -jnp.inf)
    keep, order = nms(flat_props, flat_scores, cfg.rpn_nms_iou)
    # order is score-sorted; pick the first max_per_img kept entries
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    r = cfg.rpn_max_per_img
    slots = jnp.where(keep & (rank < r), rank, r)
    merged = jnp.zeros((r + 1, 4), flat_props.dtype).at[slots].set(
        flat_props[order])[:r]
    merged_valid = jnp.zeros((r + 1,), bool).at[slots].set(
        keep & jnp.isfinite(flat_scores[order]))[:r]
    return feats, merged, merged_valid


def maskrcnn_aug_test(
    model,
    variables,
    images: jnp.ndarray,        # (V, H, W, 3) — every view on ONE canvas
    scale_factors: jnp.ndarray,  # (V,)
    flips: jnp.ndarray,          # (V,) bool
    content_hw: jnp.ndarray,     # (V, 2) resized content (h, w) per view
    loss_cls,
    cfg=None,
):
    """Single-image TTA. Returns fixed-shape detections in ORIGINAL image
    coordinates: boxes (K,4), scores (K,), labels (K,), valid (K,), and
    masks (K,S,S) sigmoid probabilities when the model has a mask head."""
    from iif_tpu.detection.bbox_head import (BBOX_TARGET_MEANS,
                                             BBOX_TARGET_STDS)
    from iif_tpu.detection.detector import DetTestCfg
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor
    from iif_tpu.ops.boxes import delta2bbox
    from iif_tpu.ops.nms import multiclass_nms

    if cfg is None:
        cfg = DetTestCfg()
    v, img_h, img_w, _ = images.shape
    sf = scale_factors.astype(jnp.float32)
    cw = content_hw[:, 1].astype(jnp.float32)
    feats, merged, merged_valid = _merged_aug_proposals(
        model, variables, images, sf, flips, cw, cfg)
    r = merged.shape[0]
    tta_ext = "ml" if getattr(cfg, "roi_ext", "ml") == "ml" else False

    # ---- stage 2: re-score the merged set through the bbox head per view
    view_props = _boxes_to_view(merged[None], sf[:, None],
                                flips[:, None], cw[:, None])
    vidx = jnp.repeat(jnp.arange(v, dtype=jnp.float32), r)
    rois5 = jnp.concatenate([vidx[:, None], view_props.reshape(-1, 4)],
                            axis=1)
    extractor = SingleRoIExtractor((7, 7), use_pallas=tta_ext)
    roi_feats = extractor(feats[:4], rois5)
    fwd_bbox = getattr(type(model), "forward_bbox", None)
    cls_score, bbox_pred, _ = model.apply(variables, roi_feats,
                                          method=fwd_bbox)
    if hasattr(loss_cls, "get_activation") and getattr(
            loss_cls, "custom_activation", False):
        scores_v = loss_cls.get_activation(cls_score)
    else:
        scores_v = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
    scores_v = scores_v.reshape(v, r, -1)
    boxes_v = delta2bbox(view_props.reshape(-1, 4),
                         bbox_pred.astype(jnp.float32),
                         BBOX_TARGET_MEANS, BBOX_TARGET_STDS)
    # clamp to each view's resized content (reference: img_shape clamp)
    ch = content_hw[:, 0].astype(jnp.float32)
    boxes_v = boxes_v.reshape(v, r, -1, 4)
    bx = jnp.clip(boxes_v[..., 0::2], 0.0,
                  cw[:, None, None, None])
    by = jnp.clip(boxes_v[..., 1::2], 0.0,
                  ch[:, None, None, None])
    boxes_v = jnp.stack([bx[..., 0], by[..., 0], bx[..., 1], by[..., 1]],
                        axis=-1)
    boxes_orig = _boxes_from_view(boxes_v, sf[:, None, None],
                                  flips[:, None, None],
                                  cw[:, None, None])
    # merge_aug_bboxes: elementwise mean over views (same proposal order)
    mean_boxes = boxes_orig.mean(axis=0)            # (r, C or 1, 4)
    mean_scores = scores_v.mean(axis=0)             # (r, C+1)
    mean_scores = jnp.where(merged_valid[:, None], mean_scores, 0.0)
    dets, det_scores, det_labels, det_valid = multiclass_nms(
        mean_boxes.reshape(r, -1), mean_scores, cfg.score_thr,
        cfg.nms_iou, cfg.max_per_img)

    out = {"boxes": dets, "scores": det_scores, "labels": det_labels,
           "valid": det_valid}
    if getattr(model, "with_mask", False):
        k = dets.shape[0]
        det_view = _boxes_to_view(dets[None], sf[:, None],
                                  flips[:, None], cw[:, None])
        vidx2 = jnp.repeat(jnp.arange(v, dtype=jnp.float32), k)
        mrois = jnp.concatenate([vidx2[:, None], det_view.reshape(-1, 4)],
                                axis=1)
        mfeats = SingleRoIExtractor(
            (14, 14), use_pallas=tta_ext)(feats[:4], mrois)
        cls_idx = jnp.clip(jnp.tile(det_labels, v), 0,
                           model.num_classes - 1)
        sel = model.apply(variables, mfeats, cls_idx,
                          method=type(model).forward_mask_for_labels)
        probs = jax.nn.sigmoid(sel.astype(jnp.float32))
        probs = probs.reshape(v, k, *probs.shape[1:])
        # merge_aug_masks: mean of sigmoid maps; flipped views' masks are
        # horizontally mirrored back before averaging
        probs = jnp.where(flips[:, None, None, None],
                          probs[:, :, :, ::-1], probs)
        out["masks"] = probs.mean(axis=0)
    return out


def cascade_aug_test(
    model,
    variables,
    images: jnp.ndarray,         # (V, H, W, 3)
    scale_factors: jnp.ndarray,  # (V,)
    flips: jnp.ndarray,          # (V,) bool
    content_hw: jnp.ndarray,     # (V, 2)
    loss_cls_per_stage,
    cfg=None,
):
    """Cascade aug-test (``cascade_roi_head.py:458-530``): per view the
    merged proposals run all stages with between-stage label-selected
    refinement, stage activations are averaged (matching our
    ``cascade_simple_test``), then boxes/scores are averaged across views
    and one multiclass NMS runs; masks average over stages AND views."""
    from iif_tpu.detection.cascade import (CascadeMaskRCNN, _refine,
                                           _select_pred)
    from iif_tpu.detection.detector import DetTestCfg
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor
    from iif_tpu.ops.nms import multiclass_nms

    if cfg is None:
        cfg = DetTestCfg()
    v = images.shape[0]
    sf = scale_factors.astype(jnp.float32)
    cw = content_hw[:, 1].astype(jnp.float32)
    ch = content_hw[:, 0].astype(jnp.float32)
    feats, merged, merged_valid = _merged_aug_proposals(
        model, variables, images, sf, flips, cw, cfg)
    r = merged.shape[0]
    tta_ext = "ml" if getattr(cfg, "roi_ext", "ml") == "ml" else False

    def _clamp_view(boxes_vr4):
        bx = jnp.clip(boxes_vr4[..., 0::2], 0.0, cw[:, None, None])
        by = jnp.clip(boxes_vr4[..., 1::2], 0.0, ch[:, None, None])
        return jnp.stack([bx[..., 0], by[..., 0], bx[..., 1], by[..., 1]],
                         axis=-1)

    rois = _boxes_to_view(merged[None], sf[:, None], flips[:, None],
                          cw[:, None])                  # (V, R, 4)
    vidx = jnp.repeat(jnp.arange(v, dtype=jnp.float32), r)
    extractor = SingleRoIExtractor((7, 7), use_pallas=tta_ext)
    stage_scores = []
    for stage in range(model.num_stages):
        rois5 = jnp.concatenate([vidx[:, None], rois.reshape(-1, 4)],
                                axis=1)
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
        fg_label = cls_score[:, :-1].argmax(-1)
        pred4 = _select_pred(bbox_pred, fg_label, model.num_classes,
                             model.reg_class_agnostic)
        if stage < model.num_stages - 1:
            rois = _clamp_view(_refine(
                rois.reshape(-1, 4), pred4, None,
                model.stage_stds[stage]).reshape(v, r, 4))

    final_view = _clamp_view(_refine(
        rois.reshape(-1, 4), pred4, None,
        model.stage_stds[-1]).reshape(v, r, 4))
    boxes_orig = _boxes_from_view(final_view, sf[:, None], flips[:, None],
                                  cw[:, None])          # (V, R, 4)
    avg_scores = (sum(stage_scores) / len(stage_scores)).reshape(v, r, -1)
    mean_boxes = boxes_orig.mean(axis=0)                # (R, 4)
    mean_scores = avg_scores.mean(axis=0)               # (R, C+1)
    mean_scores = jnp.where(merged_valid[:, None], mean_scores, 0.0)
    dets, det_scores, det_labels, det_valid = multiclass_nms(
        mean_boxes, mean_scores, cfg.score_thr, cfg.nms_iou,
        cfg.max_per_img)

    out = {"boxes": dets, "scores": det_scores, "labels": det_labels,
           "valid": det_valid}
    if getattr(model, "with_mask", False):
        k = dets.shape[0]
        det_view = _boxes_to_view(dets[None], sf[:, None], flips[:, None],
                                  cw[:, None])
        vidx2 = jnp.repeat(jnp.arange(v, dtype=jnp.float32), k)
        mrois = jnp.concatenate([vidx2[:, None], det_view.reshape(-1, 4)],
                                axis=1)
        mfeats = SingleRoIExtractor(
            (14, 14), use_pallas=tta_ext)(feats[:4], mrois)
        cls_idx = jnp.clip(jnp.tile(det_labels, v), 0,
                           model.num_classes - 1)
        probs = 0.0
        for stage in range(model.num_stages):
            sel = model.apply(
                variables, mfeats, cls_idx, stage,
                method=CascadeMaskRCNN.forward_mask_for_labels_stage)
            probs = probs + jax.nn.sigmoid(sel.astype(jnp.float32))
        probs = (probs / model.num_stages).reshape(v, k, 28, 28)
        probs = jnp.where(flips[:, None, None, None],
                          probs[:, :, :, ::-1], probs)
        out["masks"] = probs.mean(axis=0)
    return out
