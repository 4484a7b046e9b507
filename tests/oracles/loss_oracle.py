"""Torch oracles for the reweighting loss family: the reference's
pure-torch loss math lifted verbatim-in-spirit (same loops, same
`.item()` syncs, same in-place buffer edits) so the vectorized TPU
implementations in ``iif_tpu/detection/losses_extra.py`` can be
differential-tested against it.

Lifted behaviors:
- ``seesaw_ce_loss_t`` / ``seesaw_forward_t`` —
  ``mmdet/models/losses/seesaw_loss.py:12-262``.
- ``ghmc_t`` / ``ghmr_t`` — ``mmdet/models/losses/ghm_loss.py:23-218``
  (including the per-bin python loop and the momentum accumulator).
- ``balanced_l1_t`` — ``balanced_l1_loss.py:12-56``.
- ``isr_p_t`` / ``carl_t`` — ``pisa_loss.py:9-180`` with the
  SamplingResult merge replaced by a precomputed global ``gts`` vector
  (the only non-tensor input the reference takes).
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


# ------------------------------------------------------------------ seesaw
def seesaw_ce_loss_t(cls_score, labels, label_weights, cum_samples,
                     num_classes, p, q, eps):
    onehot = F.one_hot(labels, num_classes)
    seesaw_weights = cls_score.new_ones(onehot.size())
    if p > 0:
        ratio = cum_samples[None, :].clamp(min=1) / \
            cum_samples[:, None].clamp(min=1)
        index = (ratio < 1.0).float()
        sample_weights = ratio.pow(p) * index + (1 - index)
        seesaw_weights = seesaw_weights * sample_weights[labels.long(), :]
    if q > 0:
        scores = F.softmax(cls_score.detach(), dim=1)
        self_scores = scores[torch.arange(len(scores)).long(),
                             labels.long()]
        score_matrix = scores / self_scores[:, None].clamp(min=eps)
        index = (score_matrix > 1.0).float()
        comp = score_matrix.pow(q) * index + (1 - index)
        seesaw_weights = seesaw_weights * comp
    cls_score = cls_score + (seesaw_weights.log() * (1 - onehot))
    loss = F.cross_entropy(cls_score, labels, weight=None,
                           reduction='none')
    if label_weights is not None:
        loss = loss * label_weights.float()
    return loss.mean()


def seesaw_forward_t(cls_score, labels, cum_samples, num_classes,
                     p=0.8, q=2.0, eps=1e-2):
    """SeesawLoss.forward (``seesaw_loss.py:200-262``): accumulates
    cum_samples in place, returns (loss_classes, loss_objectness)."""
    pos_inds = labels < num_classes
    obj_labels = (labels == num_classes).long()
    for u_l in labels.unique():
        cum_samples[u_l] += (labels == u_l.item()).sum()
    label_weights = labels.new_ones(labels.size(), dtype=torch.float)
    cls_classes, cls_obj = cls_score[..., :-2], cls_score[..., -2:]
    if pos_inds.sum() > 0:
        loss_classes = seesaw_ce_loss_t(
            cls_classes[pos_inds], labels[pos_inds],
            label_weights[pos_inds], cum_samples[:num_classes],
            num_classes, p, q, eps)
    else:
        loss_classes = cls_classes[pos_inds].sum()
    loss_obj = F.cross_entropy(cls_obj, obj_labels, reduction='none')
    loss_obj = (loss_obj * label_weights).mean()
    return loss_classes, loss_obj


def seesaw_activation_t(cls_score):
    cls_classes, cls_obj = cls_score[..., :-2], cls_score[..., -2:]
    score_classes = F.softmax(cls_classes, dim=-1)
    score_obj = F.softmax(cls_obj, dim=-1)
    return torch.cat([score_classes * score_obj[..., [0]],
                      score_obj[..., [1]]], dim=-1)


# --------------------------------------------------------------------- GHM
def ghmc_t(pred, target, label_weight, bins=10, momentum=0.0,
           acc_sum=None):
    edges = torch.arange(bins + 1).float() / bins
    edges[-1] += 1e-6
    weights = torch.zeros_like(pred)
    g = torch.abs(pred.sigmoid().detach() - target)
    valid = label_weight > 0
    tot = max(valid.float().sum().item(), 1.0)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum().item()
        if num_in_bin > 0:
            if momentum > 0:
                acc_sum[i] = momentum * acc_sum[i] \
                    + (1 - momentum) * num_in_bin
                weights[inds] = tot / acc_sum[i]
            else:
                weights[inds] = tot / num_in_bin
            n += 1
    if n > 0:
        weights = weights / n
    loss = F.binary_cross_entropy_with_logits(pred, target,
                                              reduction='none')
    return (loss * weights).sum() / tot


def ghmr_t(pred, target, label_weight, mu=0.02, bins=10, momentum=0.0,
           acc_sum=None):
    edges = torch.arange(bins + 1).float() / bins
    edges[-1] = 1e3
    diff = pred - target
    loss = torch.sqrt(diff * diff + mu * mu) - mu
    g = torch.abs(diff / torch.sqrt(mu * mu + diff * diff)).detach()
    weights = torch.zeros_like(g)
    valid = label_weight > 0
    tot = max(label_weight.float().sum().item(), 1.0)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in_bin = inds.sum().item()
        if num_in_bin > 0:
            n += 1
            if momentum > 0:
                acc_sum[i] = momentum * acc_sum[i] \
                    + (1 - momentum) * num_in_bin
                weights[inds] = tot / acc_sum[i]
            else:
                weights[inds] = tot / num_in_bin
    if n > 0:
        weights /= n
    return (loss * weights).sum() / tot


# -------------------------------------------------------------- balanced L1
def balanced_l1_t(pred, target, beta=1.0, alpha=0.5, gamma=1.5):
    diff = torch.abs(pred - target)
    b = np.e ** (gamma / alpha) - 1
    return torch.where(
        diff < beta,
        alpha / b * (b * diff + 1) * torch.log(b * diff / beta + 1)
        - alpha * diff,
        gamma * diff + gamma / b - alpha * beta)


# -------------------------------------------------------------------- PISA
def isr_p_t(cls_score, labels, label_weights, ious, gts, num_class,
            k=2.0, bias=0.0):
    """``pisa_loss.py:9-119`` with the decoded-IoU computation and the
    per-image gt merge hoisted out (``ious``/``gts`` are inputs)."""
    pos_label_inds = ((labels >= 0)
                      & (labels < num_class)).nonzero().reshape(-1)
    pos_labels = labels[pos_label_inds]
    if pos_label_inds.numel() == 0:
        return label_weights
    ious = ious[pos_label_inds].clone()
    pos_imp_weights = label_weights[pos_label_inds].clone()
    max_l_num = pos_labels.bincount().max()
    for label in pos_labels.unique():
        l_inds = (pos_labels == label).nonzero().view(-1)
        l_gts = gts[pos_label_inds][l_inds]
        for t in l_gts.unique():
            t_inds = l_inds[l_gts == t]
            t_ious = ious[t_inds]
            _, t_iou_rank_idx = t_ious.sort(descending=True)
            _, t_iou_rank = t_iou_rank_idx.sort()
            ious[t_inds] += max_l_num - t_iou_rank.float()
        l_ious = ious[l_inds]
        _, l_iou_rank_idx = l_ious.sort(descending=True)
        _, l_iou_rank = l_iou_rank_idx.sort()
        pos_imp_weights[l_inds] *= \
            (max_l_num - l_iou_rank.float()) / max_l_num
    pos_imp_weights = (bias + pos_imp_weights * (1 - bias)).pow(k)

    pos_loss_cls = F.cross_entropy(cls_score[pos_label_inds], pos_labels,
                                   reduction='none')
    ori = pos_loss_cls * label_weights[pos_label_inds]
    new = pos_loss_cls * pos_imp_weights
    pos_imp_weights = pos_imp_weights * (ori.sum() / new.sum())
    out = label_weights.clone()
    out[pos_label_inds] = pos_imp_weights
    return out


def carl_t(cls_score, labels, bbox_pred_sel, bbox_targets, loss_bbox_fn,
           num_class, k=1.0, bias=0.2, avg_factor=None, sigmoid=False):
    pos_label_inds = ((labels >= 0)
                      & (labels < num_class)).nonzero().reshape(-1)
    if pos_label_inds.numel() == 0:
        return cls_score.sum() * 0.
    pos_labels = labels[pos_label_inds]
    if sigmoid:
        pos_cls_score = cls_score.sigmoid()[pos_label_inds, pos_labels]
    else:
        pos_cls_score = cls_score.softmax(-1)[pos_label_inds, pos_labels]
    w = (bias + (1 - bias) * pos_cls_score).pow(k)
    num_pos = float(pos_cls_score.size(0))
    w = w * (num_pos / w.sum())
    if avg_factor is None:
        avg_factor = bbox_targets.size(0)
    ori = loss_bbox_fn(bbox_pred_sel[pos_label_inds],
                       bbox_targets[pos_label_inds]) / avg_factor
    return (ori * w[:, None]).sum()
