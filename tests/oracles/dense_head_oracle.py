"""Torch oracles for dense-head variants (FreeAnchor, and later GA /
SABL / centripetal targets): the reference's pure-torch head math lifted
with its original control flow (per-image loops, sparse COO tensors,
torch.topk) for differential testing against the vectorized TPU
implementations.

- ``free_anchor_losses_t`` —
  ``mmdet/models/dense_heads/free_anchor_retina_head.py:54-270``
  restricted to one image (the reference loops images and sums).
"""
from __future__ import annotations

import torch
import torch.nn.functional as F

from tests.oracles.geometry_oracle import bbox2delta_t, delta2bbox_t

EPS = 1e-12


def _overlaps_t(a, b):
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter).clamp(1e-6)


def free_anchor_losses_t(anchors, cls_scores, bbox_preds, gt_bboxes,
                         gt_labels, num_classes, pre_anchor_topk=8,
                         bbox_thr=0.6, gamma=2.0, alpha=0.5,
                         smooth_l1_beta=0.11, reg_weight=0.75):
    """One-image FreeAnchor (positive_loss, negative_loss), including the
    reference's sparse-COO class-wise max (:128-165) and bag construction
    (:170-200); normalization over num_pos as in :200-215."""
    cls_prob = torch.sigmoid(cls_scores)
    with torch.no_grad():
        pred_boxes = delta2bbox_t(anchors, bbox_preds)
        object_box_iou = _overlaps_t(gt_bboxes, pred_boxes)
        t1 = bbox_thr
        t2 = object_box_iou.max(dim=1, keepdim=True).values.clamp(
            min=t1 + 1e-12)
        object_box_prob = ((object_box_iou - t1) / (t2 - t1)).clamp(
            min=0, max=1)

        num_obj = gt_labels.size(0)
        indices = torch.stack(
            [torch.arange(num_obj).type_as(gt_labels), gt_labels], dim=0)
        object_cls_box_prob = torch.sparse_coo_tensor(
            indices, object_box_prob)
        box_cls_prob = torch.sparse.sum(object_cls_box_prob,
                                        dim=0).to_dense()
        nz = torch.nonzero(box_cls_prob, as_tuple=False).t_()
        if nz.numel() == 0:
            image_box_prob = torch.zeros(
                anchors.size(0), num_classes).type_as(object_box_prob)
        else:
            nonzero_box_prob = torch.where(
                gt_labels.unsqueeze(-1) == nz[0],
                object_box_prob[:, nz[1]],
                torch.tensor([0.]).type_as(object_box_prob)
            ).max(dim=0).values
            image_box_prob = torch.sparse_coo_tensor(
                nz.flip([0]), nonzero_box_prob,
                size=(anchors.size(0), num_classes)).to_dense()

    match_quality_matrix = _overlaps_t(gt_bboxes, anchors)
    _, matched = torch.topk(match_quality_matrix, pre_anchor_topk,
                            dim=1, sorted=False)
    matched_cls_prob = torch.gather(
        cls_prob[matched], 2,
        gt_labels.view(-1, 1, 1).repeat(1, pre_anchor_topk, 1)).squeeze(2)
    matched_anchors = anchors[matched]
    matched_object_targets = bbox2delta_t(
        matched_anchors.reshape(-1, 4),
        gt_bboxes.unsqueeze(1).expand_as(matched_anchors).reshape(-1, 4)
    ).reshape(num_obj, pre_anchor_topk, 4)
    loss_bbox = reg_weight * F.smooth_l1_loss(
        bbox_preds[matched], matched_object_targets,
        reduction='none', beta=smooth_l1_beta).sum(-1)
    matched_box_prob = torch.exp(-loss_bbox)

    # positive bag loss (:221-246)
    matched_prob = matched_cls_prob * matched_box_prob
    weight = 1 / torch.clamp(1 - matched_prob, 1e-12, None)
    weight /= weight.sum(dim=1).unsqueeze(-1)
    bag_prob = (weight * matched_prob).sum(dim=1)
    positive_loss = alpha * F.binary_cross_entropy(
        bag_prob, torch.ones_like(bag_prob), reduction='none')

    # negative bag loss (:248-270)
    prob = cls_prob * (1 - image_box_prob)
    prob = prob.clamp(min=EPS, max=1 - EPS)
    negative = (1 - alpha) * prob ** gamma * F.binary_cross_entropy(
        prob, torch.zeros_like(prob), reduction='none')

    num_pos = num_obj
    return (positive_loss.sum() / max(1, num_pos),
            negative.sum() / max(1, num_pos * pre_anchor_topk))
