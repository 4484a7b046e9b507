"""Test oracles: the reference's pure-torch geometry functions, lifted
for differential testing of the iif_tpu geometry stack (VERDICT round-2
item 3 — "lift the pure-torch reference functions as oracles").

Lifted behaviors (trimmed of onnx/YOLOF branches the IIF configs never
take):

- ``bbox2delta_t`` / ``delta2bbox_t`` —
  ``mmdet/core/bbox/coder/delta_xywh_bbox_coder.py:96-272``.
- ``AnchorOracle`` — ``mmdet/core/anchor/anchor_generator.py:131-440``
  (gen_single_level_base_anchors, _meshgrid, single_level_grid_anchors,
  valid_flags) restricted to the RPN config every IIF experiment uses.
- ``do_paste_mask_t`` — the detectron2-derived ``_do_paste_mask``
  (``mmdet/models/roi_heads/mask_heads/fcn_mask_head.py:344-416``),
  skip_empty=False path (the batch/GPU path the reference exports).
- ``roi_align_np`` — mmcv's RoIAlign sampling rule (aligned=True,
  explicit sampling_ratio; average pooling of bilinear taps with
  boundary clamping, ``mmcv/ops/roi_align.py`` CPU kernel semantics)
  re-expressed as a plain numpy loop, sharing no code with either the
  product's flat-gather or Pallas extractors.
- ``nms_np`` — greedy score-ordered hard NMS (torchvision semantics,
  what mmcv.ops.nms computes) as an independent numpy loop.

These oracles are deliberately written in the reference's torch idiom
(interleaved per-class delta layout, expand_as broadcasting, grid_sample
normalized coords) so a mismatch localizes a semantic divergence in the
product code rather than in the test.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


# --------------------------------------------------------------- box coder
def bbox2delta_t(proposals, gt, means=(0., 0., 0., 0.),
                 stds=(1., 1., 1., 1.)):
    proposals = proposals.float()
    gt = gt.float()
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = torch.log(gw / pw)
    dh = torch.log(gh / ph)
    deltas = torch.stack([dx, dy, dw, dh], dim=-1)

    means = deltas.new_tensor(means).unsqueeze(0)
    stds = deltas.new_tensor(stds).unsqueeze(0)
    return deltas.sub_(means).div_(stds)


def delta2bbox_t(rois, deltas, means=(0., 0., 0., 0.),
                 stds=(1., 1., 1., 1.), max_shape=None,
                 wh_ratio_clip=16 / 1000):
    means = deltas.new_tensor(means).view(1, -1).repeat(
        1, deltas.size(-1) // 4)
    stds = deltas.new_tensor(stds).view(1, -1).repeat(
        1, deltas.size(-1) // 4)
    denorm_deltas = deltas * stds + means
    dx = denorm_deltas[..., 0::4]
    dy = denorm_deltas[..., 1::4]
    dw = denorm_deltas[..., 2::4]
    dh = denorm_deltas[..., 3::4]

    x1, y1 = rois[..., 0], rois[..., 1]
    x2, y2 = rois[..., 2], rois[..., 3]
    px = ((x1 + x2) * 0.5).unsqueeze(-1).expand_as(dx)
    py = ((y1 + y2) * 0.5).unsqueeze(-1).expand_as(dy)
    pw = (x2 - x1).unsqueeze(-1).expand_as(dw)
    ph = (y2 - y1).unsqueeze(-1).expand_as(dh)

    dx_width = pw * dx
    dy_height = ph * dy

    max_ratio = np.abs(np.log(wh_ratio_clip))
    dw = dw.clamp(min=-max_ratio, max=max_ratio)
    dh = dh.clamp(min=-max_ratio, max=max_ratio)
    gw = pw * dw.exp()
    gh = ph * dh.exp()
    gx = px + dx_width
    gy = py + dy_height
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    bboxes = torch.stack([x1, y1, x2, y2], dim=-1).view(deltas.size())

    if max_shape is not None:
        max_shape = x1.new_tensor(max_shape)[..., :2]
        min_xy = x1.new_tensor(0)
        max_xy = torch.cat([max_shape] * (deltas.size(-1) // 2),
                           dim=-1).flip(-1).unsqueeze(-2)
        bboxes = torch.where(bboxes < min_xy, min_xy, bboxes)
        bboxes = torch.where(bboxes > max_xy, max_xy, bboxes)
    return bboxes


# ----------------------------------------------------------------- anchors
class AnchorOracle:
    """The reference AnchorGenerator restricted to the MaskRCNN-RPN
    configuration family (no octave scales, no explicit centers,
    scale_major=True, center_offset=0 by default)."""

    def __init__(self, strides, ratios=(0.5, 1.0, 2.0), scales=(8.0,),
                 center_offset=0.0):
        self.strides = [(s, s) for s in strides]
        self.base_sizes = [min(st) for st in self.strides]
        self.scales = torch.tensor(scales, dtype=torch.float32)
        self.ratios = torch.tensor(ratios, dtype=torch.float32)
        self.center_offset = center_offset
        self.base_anchors = self.gen_base_anchors()

    @property
    def num_base_anchors(self):
        return [a.size(0) for a in self.base_anchors]

    def gen_base_anchors(self):
        out = []
        for base_size in self.base_sizes:
            w = h = base_size
            x_center = self.center_offset * w
            y_center = self.center_offset * h
            h_ratios = torch.sqrt(self.ratios)
            w_ratios = 1 / h_ratios
            ws = (w * w_ratios[:, None] * self.scales[None, :]).view(-1)
            hs = (h * h_ratios[:, None] * self.scales[None, :]).view(-1)
            out.append(torch.stack([
                x_center - 0.5 * ws, y_center - 0.5 * hs,
                x_center + 0.5 * ws, y_center + 0.5 * hs], dim=-1))
        return out

    @staticmethod
    def _meshgrid(x, y):
        xx = x.repeat(y.shape[0])
        yy = y.view(-1, 1).repeat(1, x.shape[0]).view(-1)
        return xx, yy

    def grid_anchors(self, featmap_sizes):
        out = []
        for i, (feat_h, feat_w) in enumerate(featmap_sizes):
            stride = self.strides[i]
            shift_x = torch.arange(0, feat_w) * stride[0]
            shift_y = torch.arange(0, feat_h) * stride[1]
            shift_xx, shift_yy = self._meshgrid(shift_x, shift_y)
            shifts = torch.stack(
                [shift_xx, shift_yy, shift_xx, shift_yy], dim=-1).float()
            all_anchors = (self.base_anchors[i][None, :, :]
                           + shifts[:, None, :])
            out.append(all_anchors.view(-1, 4))
        return out

    def valid_flags(self, featmap_sizes, pad_shape):
        out = []
        for i, (feat_h, feat_w) in enumerate(featmap_sizes):
            stride = self.strides[i]
            h, w = pad_shape[:2]
            valid_h = min(int(np.ceil(h / stride[1])), feat_h)
            valid_w = min(int(np.ceil(w / stride[0])), feat_w)
            valid_x = torch.zeros(feat_w, dtype=torch.bool)
            valid_y = torch.zeros(feat_h, dtype=torch.bool)
            valid_x[:valid_w] = 1
            valid_y[:valid_h] = 1
            valid_xx, valid_yy = self._meshgrid(valid_x, valid_y)
            valid = valid_xx & valid_yy
            out.append(valid[:, None].expand(
                valid.size(0), self.num_base_anchors[i]).reshape(-1))
        return out


# -------------------------------------------------------------- mask paste
def do_paste_mask_t(masks, boxes, img_h, img_w):
    """masks (N,1,S,S) logits-or-probs, boxes (N,4) -> (N,img_h,img_w)
    float; skip_empty=False path."""
    x0, y0, x1, y1 = torch.split(boxes, 1, dim=1)
    N = masks.shape[0]
    img_y = torch.arange(0, img_h).float() + 0.5
    img_x = torch.arange(0, img_w).float() + 0.5
    img_y = (img_y - y0) / (y1 - y0) * 2 - 1
    img_x = (img_x - x0) / (x1 - x0) * 2 - 1
    gx = img_x[:, None, :].expand(N, img_y.size(1), img_x.size(1))
    gy = img_y[:, :, None].expand(N, img_y.size(1), img_x.size(1))
    grid = torch.stack([gx, gy], dim=3)
    img_masks = F.grid_sample(masks.float(), grid, align_corners=False)
    return img_masks[:, 0]


# --------------------------------------------------------------- roi align
def roi_align_np(feat, rois, spatial_scale, out_size=7, sampling_ratio=2,
                 aligned=True):
    """feat (B,H,W,C) numpy; rois (R,5)=(batch,x1,y1,x2,y2) image coords.
    mmcv aligned RoIAlign: per output bin, average ``s*s`` bilinear taps
    placed at ``(i+0.5)/s`` fractions of the bin, coords clamped to the
    feature grid."""
    b, h, w, c = feat.shape
    r = rois.shape[0]
    s = sampling_ratio
    off = 0.5 if aligned else 0.0
    out = np.zeros((r, out_size, out_size, c), np.float32)
    for i in range(r):
        bi = int(rois[i, 0])
        x1 = rois[i, 1] * spatial_scale - off
        y1 = rois[i, 2] * spatial_scale - off
        x2 = rois[i, 3] * spatial_scale - off
        y2 = rois[i, 4] * spatial_scale - off
        bw = (x2 - x1) / out_size
        bh = (y2 - y1) / out_size
        for oy in range(out_size):
            for ox in range(out_size):
                acc = np.zeros(c, np.float32)
                for sy in range(s):
                    for sx in range(s):
                        yy = y1 + bh * (oy + (sy + 0.5) / s)
                        xx = x1 + bw * (ox + (sx + 0.5) / s)
                        yy = min(max(yy, 0.0), h - 1.0)
                        xx = min(max(xx, 0.0), w - 1.0)
                        y0i = int(np.floor(yy))
                        x0i = int(np.floor(xx))
                        y1i = min(y0i + 1, h - 1)
                        x1i = min(x0i + 1, w - 1)
                        ly = yy - y0i
                        lx = xx - x0i
                        acc += ((1 - ly) * (1 - lx) * feat[bi, y0i, x0i]
                                + (1 - ly) * lx * feat[bi, y0i, x1i]
                                + ly * (1 - lx) * feat[bi, y1i, x0i]
                                + ly * lx * feat[bi, y1i, x1i])
                out[i, oy, ox] = acc / (s * s)
    return out


# --------------------------------------------------------------------- nms
def nms_np(boxes, scores, iou_thr):
    """Greedy hard NMS; returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), bool)
    areas = ((boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]))
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        xx1 = np.maximum(boxes[idx, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[idx, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[idx, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[idx, 3], boxes[:, 3])
        inter = (np.clip(xx2 - xx1, 0, None)
                 * np.clip(yy2 - yy1, 0, None))
        iou = inter / np.maximum(areas[idx] + areas - inter, 1e-12)
        suppressed |= iou > iou_thr
    return np.asarray(keep, np.int64)


# -------------------------------------------------------------------- atss
def atss_assign_t(anchors, num_level_bboxes, gt_bboxes, topk=9):
    """The ATSS adaptive assigner
    (``mmdet/core/bbox/assigners/atss_assigner.py:34-180``) lifted in its
    torch idiom: per-level top-k closest centers -> candidate IoU
    mean+std threshold -> center-inside-gt filter -> per-anchor max-IoU
    conflict resolution. Returns assigned_gt_inds (N,) with 0=bg,
    i+1=gt i (no ignore regions, matching the ATSS config)."""
    INF = 100000000
    num_gt, num_bboxes = gt_bboxes.size(0), anchors.size(0)

    def iou_mat(a, b):
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = torch.max(a[:, None, :2], b[None, :, :2])
        rb = torch.min(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area_a[:, None] + area_b[None, :]
                        - inter).clamp(min=1e-6)

    overlaps = iou_mat(anchors, gt_bboxes)
    assigned_gt_inds = overlaps.new_full((num_bboxes,), 0,
                                         dtype=torch.long)
    if num_gt == 0:
        return assigned_gt_inds

    gt_cx = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2.0
    gt_cy = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2.0
    gt_points = torch.stack((gt_cx, gt_cy), dim=1)
    bboxes_cx = (anchors[:, 0] + anchors[:, 2]) / 2.0
    bboxes_cy = (anchors[:, 1] + anchors[:, 3]) / 2.0
    bboxes_points = torch.stack((bboxes_cx, bboxes_cy), dim=1)
    distances = (bboxes_points[:, None, :]
                 - gt_points[None, :, :]).pow(2).sum(-1).sqrt()

    candidate_idxs = []
    start_idx = 0
    for bboxes_per_level in num_level_bboxes:
        end_idx = start_idx + bboxes_per_level
        distances_per_level = distances[start_idx:end_idx, :]
        selectable_k = min(topk, bboxes_per_level)
        _, topk_idxs_per_level = distances_per_level.topk(
            selectable_k, dim=0, largest=False)
        candidate_idxs.append(topk_idxs_per_level + start_idx)
        start_idx = end_idx
    candidate_idxs = torch.cat(candidate_idxs, dim=0)

    candidate_overlaps = overlaps[candidate_idxs, torch.arange(num_gt)]
    overlaps_thr_per_gt = (candidate_overlaps.mean(0)
                           + candidate_overlaps.std(0))
    is_pos = candidate_overlaps >= overlaps_thr_per_gt[None, :]

    for gt_idx in range(num_gt):
        candidate_idxs[:, gt_idx] += gt_idx * num_bboxes
    ep_bboxes_cx = bboxes_cx.view(1, -1).expand(
        num_gt, num_bboxes).contiguous().view(-1)
    ep_bboxes_cy = bboxes_cy.view(1, -1).expand(
        num_gt, num_bboxes).contiguous().view(-1)
    candidate_idxs = candidate_idxs.view(-1)

    l_ = ep_bboxes_cx[candidate_idxs].view(-1, num_gt) - gt_bboxes[:, 0]
    t_ = ep_bboxes_cy[candidate_idxs].view(-1, num_gt) - gt_bboxes[:, 1]
    r_ = gt_bboxes[:, 2] - ep_bboxes_cx[candidate_idxs].view(-1, num_gt)
    b_ = gt_bboxes[:, 3] - ep_bboxes_cy[candidate_idxs].view(-1, num_gt)
    is_in_gts = torch.stack([l_, t_, r_, b_], dim=1).min(dim=1)[0] > 0.01
    is_pos = is_pos & is_in_gts

    overlaps_inf = torch.full_like(overlaps,
                                   -INF).t().contiguous().view(-1)
    index = candidate_idxs.view(-1)[is_pos.view(-1)]
    overlaps_inf[index] = overlaps.t().contiguous().view(-1)[index]
    overlaps_inf = overlaps_inf.view(num_gt, -1).t()

    max_overlaps, argmax_overlaps = overlaps_inf.max(dim=1)
    assigned_gt_inds[
        max_overlaps != -INF] = argmax_overlaps[max_overlaps != -INF] + 1
    return assigned_gt_inds


# ------------------------------------------------------------------ simOTA
def sim_ota_assign_t(pred_scores, priors, decoded_bboxes, gt_bboxes,
                     gt_labels, num_classes, center_radius=2.5,
                     candidate_topk=10, cls_weight=1.0, iou_weight=3.0,
                     eps=1e-7):
    """The SimOTA assigner (``sim_ota_assigner.py:95-254`` +
    ``dynamic_k_matching``) lifted in its torch idiom (dynamic boolean
    indexing, per-gt topk loops). Returns (assigned_gt_inds (P,) with
    0=bg / i+1=gt i, matched_pred_ious (P,) valid where assigned>0)."""
    INF = 100000000
    num_gt = gt_bboxes.size(0)
    num_bboxes = decoded_bboxes.size(0)
    assigned_gt_inds = decoded_bboxes.new_full((num_bboxes,), 0,
                                               dtype=torch.long)
    matched_ious_out = decoded_bboxes.new_zeros((num_bboxes,))
    if num_gt == 0:
        return assigned_gt_inds, matched_ious_out

    # in-gt / in-center info
    rx = priors[:, 0].unsqueeze(1).repeat(1, num_gt)
    ry = priors[:, 1].unsqueeze(1).repeat(1, num_gt)
    rsx = priors[:, 2].unsqueeze(1).repeat(1, num_gt)
    rsy = priors[:, 3].unsqueeze(1).repeat(1, num_gt)
    l_ = rx - gt_bboxes[:, 0]
    t_ = ry - gt_bboxes[:, 1]
    r_ = gt_bboxes[:, 2] - rx
    b_ = gt_bboxes[:, 3] - ry
    is_in_gts = torch.stack([l_, t_, r_, b_], dim=1).min(dim=1).values > 0
    is_in_gts_all = is_in_gts.sum(dim=1) > 0
    gt_cxs = (gt_bboxes[:, 0] + gt_bboxes[:, 2]) / 2.0
    gt_cys = (gt_bboxes[:, 1] + gt_bboxes[:, 3]) / 2.0
    cl_ = rx - (gt_cxs - center_radius * rsx)
    ct_ = ry - (gt_cys - center_radius * rsy)
    cr_ = (gt_cxs + center_radius * rsx) - rx
    cb_ = (gt_cys + center_radius * rsy) - ry
    is_in_cts = torch.stack([cl_, ct_, cr_, cb_], dim=1).min(dim=1).values > 0
    is_in_cts_all = is_in_cts.sum(dim=1) > 0
    valid_mask = is_in_gts_all | is_in_cts_all
    is_in_boxes_and_center = (is_in_gts[valid_mask, :]
                              & is_in_cts[valid_mask, :])

    def iou_mat(a, b):
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = torch.max(a[:, None, :2], b[None, :, :2])
        rb = torch.min(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area_a[:, None] + area_b[None, :]
                        - inter).clamp(min=1e-6)

    valid_decoded_bbox = decoded_bboxes[valid_mask]
    valid_pred_scores = pred_scores[valid_mask]
    num_valid = valid_decoded_bbox.size(0)
    pairwise_ious = iou_mat(valid_decoded_bbox, gt_bboxes)
    iou_cost = -torch.log(pairwise_ious + eps)
    gt_onehot_label = (
        F.one_hot(gt_labels.to(torch.int64),
                  num_classes).float().unsqueeze(0).repeat(num_valid, 1, 1))
    vps = valid_pred_scores.unsqueeze(1).repeat(1, num_gt, 1)
    cls_cost = F.binary_cross_entropy(
        vps.sqrt_(), gt_onehot_label, reduction='none').sum(-1)
    cost_matrix = (cls_cost * cls_weight + iou_cost * iou_weight
                   + (~is_in_boxes_and_center) * INF)

    # dynamic k matching
    matching_matrix = torch.zeros_like(cost_matrix)
    topk_ious, _ = torch.topk(pairwise_ious,
                              min(candidate_topk, num_valid), dim=0)
    dynamic_ks = torch.clamp(topk_ious.sum(0).int(), min=1)
    for gt_idx in range(num_gt):
        _, pos_idx = torch.topk(cost_matrix[:, gt_idx],
                                k=dynamic_ks[gt_idx].item(), largest=False)
        matching_matrix[:, gt_idx][pos_idx] = 1.0
    prior_match_gt_mask = matching_matrix.sum(1) > 1
    if prior_match_gt_mask.sum() > 0:
        _, cost_argmin = torch.min(cost_matrix[prior_match_gt_mask, :],
                                   dim=1)
        matching_matrix[prior_match_gt_mask, :] *= 0.0
        matching_matrix[prior_match_gt_mask, cost_argmin] = 1.0
    fg_mask_inboxes = matching_matrix.sum(1) > 0.0
    valid_mask[valid_mask.clone()] = fg_mask_inboxes
    matched_gt_inds = matching_matrix[fg_mask_inboxes, :].argmax(1)
    matched_pred_ious = (matching_matrix
                         * pairwise_ious).sum(1)[fg_mask_inboxes]
    assigned_gt_inds[valid_mask] = matched_gt_inds + 1
    matched_ious_out[valid_mask] = matched_pred_ious
    return assigned_gt_inds, matched_ious_out


# ------------------------------------------------------------ grid assign
def grid_assign_t(anchors, responsible, gt_bboxes, pos_iou_thr=0.5,
                  neg_iou_thr=0.5, min_pos_iou=0.0):
    """The YOLO GridAssigner (``grid_assigner.py:40-170``,
    gt_max_assign_all=True) lifted in its torch idiom. Returns
    assigned_gt_inds (N,) with -1 ignore / 0 bg / i+1 gt i."""
    num_gts, num_bboxes = gt_bboxes.size(0), anchors.size(0)

    def iou_mat(a, b):
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = torch.max(a[:, None, :2], b[None, :, :2])
        rb = torch.min(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        return inter / (area_a[:, None] + area_b[None, :]
                        - inter).clamp(min=1e-6)

    overlaps = iou_mat(gt_bboxes, anchors)                 # (G, N)
    assigned_gt_inds = overlaps.new_full((num_bboxes,), -1,
                                         dtype=torch.long)
    if num_gts == 0:
        assigned_gt_inds[:] = 0
        return assigned_gt_inds

    max_overlaps, _ = overlaps.max(dim=0)
    assigned_gt_inds[(max_overlaps >= 0)
                     & (max_overlaps <= neg_iou_thr)] = 0

    overlaps[:, ~responsible.bool()] = -1.0
    max_overlaps, argmax_overlaps = overlaps.max(dim=0)
    gt_max_overlaps, gt_argmax_overlaps = overlaps.max(dim=1)

    pos_inds = (max_overlaps > pos_iou_thr) & responsible.bool()
    assigned_gt_inds[pos_inds] = argmax_overlaps[pos_inds] + 1

    for i in range(num_gts):
        if gt_max_overlaps[i] > min_pos_iou:
            max_iou_inds = (overlaps[i, :] == gt_max_overlaps[i]) \
                & responsible.bool()
            assigned_gt_inds[max_iou_inds] = i + 1
    return assigned_gt_inds


def center_region_assign_t(bboxes, gt_bboxes, gt_labels,
                           pos_scale=0.2, neg_scale=0.2, min_pos_iof=0.01):
    """The FSAF CenterRegionAssigner
    (``mmdet/core/bbox/assigners/center_region_assigner.py:72-336``)
    lifted in its torch idiom. Returns (assigned_gt_inds (N,) 1-based /
    0=bg, shadowed (N, 2) [anchor, 1-based gt] pairs) BEFORE the
    label-override step (which fsaf tests apply separately)."""
    def scale_boxes(b, s):
        w_half = (b[:, 2] - b[:, 0]) * .5 * s
        h_half = (b[:, 3] - b[:, 1]) * .5 * s
        xc = (b[:, 2] + b[:, 0]) * .5
        yc = (b[:, 3] + b[:, 1]) * .5
        return torch.stack([xc - w_half, yc - h_half,
                            xc + w_half, yc + h_half], dim=1)

    def iof(a, b):
        lt = torch.max(a[:, None, :2], b[None, :, :2])
        rb = torch.min(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        area = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
        return inter / area.clamp(min=1e-6)

    gt_core = scale_boxes(gt_bboxes, pos_scale)
    gt_shadow = scale_boxes(gt_bboxes, neg_scale)
    centers = (bboxes[:, 2:4] + bboxes[:, 0:2]) / 2
    is_in_gt = ((centers[:, 0:1] > gt_bboxes[None, :, 0])
                & (centers[:, 0:1] < gt_bboxes[None, :, 2])
                & (centers[:, 1:2] > gt_bboxes[None, :, 1])
                & (centers[:, 1:2] < gt_bboxes[None, :, 3]))
    in_core = is_in_gt & (iof(bboxes, gt_core) > min_pos_iof)
    in_shadow = (iof(bboxes, gt_shadow) > min_pos_iof) & ~in_core

    n, g = in_core.shape
    areas = (gt_bboxes[:, 2] - gt_bboxes[:, 0]) \
        * (gt_bboxes[:, 3] - gt_bboxes[:, 1])
    _, sort_idx = areas.sort(descending=True)
    gt_priority = sort_idx.argsort()          # bigger = smaller area

    assigned = torch.zeros(n, dtype=torch.long)
    shadowed = torch.nonzero(in_shadow, as_tuple=False)
    if in_core.sum() > 0:
        pair_priority = in_core.new_full((n, g), -1, dtype=torch.long)
        matched = in_core.any(dim=1)
        matched_gt = torch.nonzero(in_core, as_tuple=False)[:, 1]
        pair_priority[in_core] = gt_priority[matched_gt]
        _, argmax_p = pair_priority[matched].max(dim=1)
        assigned[matched] = argmax_p + 1
        core2 = in_core.clone()
        core2[matched, argmax_p] = False
        shadowed = torch.cat(
            [shadowed, torch.nonzero(core2, as_tuple=False)], dim=0)
    if shadowed.numel() > 0:
        shadowed = shadowed.clone()
        shadowed[:, 1] += 1
    return assigned, shadowed


def fovea_targets_t(gt_bboxes_raw, gt_labels_raw, featmap_size, stride,
                    base_len, scale_range, num_classes, sigma=0.4):
    """One level of the FoveaBox target painter
    (``mmdet/models/dense_heads/fovea_head.py:207-266``) lifted verbatim
    (descending-area overwrite loop). Returns (labels (H, W),
    log-bbox-targets (H, W, 4))."""
    h, w = featmap_size
    y, x = torch.meshgrid(torch.arange(h).float() + 0.5,
                          torch.arange(w).float() + 0.5)
    gt_areas = torch.sqrt((gt_bboxes_raw[:, 2] - gt_bboxes_raw[:, 0])
                          * (gt_bboxes_raw[:, 3] - gt_bboxes_raw[:, 1]))
    labels = gt_labels_raw.new_zeros((h, w)) + num_classes
    bbox_targets = gt_bboxes_raw.new_ones((h, w, 4))
    lower, upper = scale_range
    hit = ((gt_areas >= lower) & (gt_areas <= upper)).nonzero().flatten()
    if len(hit) == 0:
        return labels, torch.log(bbox_targets)
    _, order = torch.sort(-gt_areas[hit])
    hit = hit[order]
    gt = gt_bboxes_raw[hit, :] / stride
    gl = gt_labels_raw[hit]
    half_w = 0.5 * (gt[:, 2] - gt[:, 0])
    half_h = 0.5 * (gt[:, 3] - gt[:, 1])
    pl = torch.ceil(gt[:, 0] + (1 - sigma) * half_w - 0.5).long() \
        .clamp(0, w - 1)
    pr = torch.floor(gt[:, 0] + (1 + sigma) * half_w - 0.5).long() \
        .clamp(0, w - 1)
    pt = torch.ceil(gt[:, 1] + (1 - sigma) * half_h - 0.5).long() \
        .clamp(0, h - 1)
    pd = torch.floor(gt[:, 1] + (1 + sigma) * half_h - 0.5).long() \
        .clamp(0, h - 1)
    for px1, py1, px2, py2, label, (gx1, gy1, gx2, gy2) in zip(
            pl, pt, pr, pd, gl, gt_bboxes_raw[hit, :]):
        labels[py1:py2 + 1, px1:px2 + 1] = label
        bbox_targets[py1:py2 + 1, px1:px2 + 1, 0] = \
            (stride * x[py1:py2 + 1, px1:px2 + 1] - gx1) / base_len
        bbox_targets[py1:py2 + 1, px1:px2 + 1, 1] = \
            (stride * y[py1:py2 + 1, px1:px2 + 1] - gy1) / base_len
        bbox_targets[py1:py2 + 1, px1:px2 + 1, 2] = \
            (gx2 - stride * x[py1:py2 + 1, px1:px2 + 1]) / base_len
        bbox_targets[py1:py2 + 1, px1:px2 + 1, 3] = \
            (gy2 - stride * y[py1:py2 + 1, px1:px2 + 1]) / base_len
    bbox_targets = bbox_targets.clamp(min=1. / 16, max=16.)
    return labels, torch.log(bbox_targets)


def uniform_assign_t(bbox_pred, anchor, gt_bboxes,
                     match_times=4, pos_ignore_thr=0.15,
                     neg_ignore_thr=0.7):
    """The YOLOF UniformAssigner
    (``mmdet/core/bbox/assigners/uniform_assigner.py:36-140``) lifted in
    its torch idiom. Returns (assigned_gt_inds (N,) {-1,0,i+1},
    pos_idx (M,) bool, indexes (M,), pos_gt_index (M,))."""
    def cxcywh(b):
        return torch.stack([(b[:, 0] + b[:, 2]) / 2,
                            (b[:, 1] + b[:, 3]) / 2,
                            b[:, 2] - b[:, 0],
                            b[:, 3] - b[:, 1]], dim=-1)

    def iou_mat(a, b):
        lt = torch.max(a[:, None, :2], b[None, :, :2])
        rb = torch.min(a[:, None, 2:], b[None, :, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[..., 0] * wh[..., 1]
        aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        return inter / (aa[:, None] + ab[None] - inter).clamp(min=1e-6)

    num_bboxes = bbox_pred.size(0)
    assigned_gt_inds = bbox_pred.new_full((num_bboxes,), 0,
                                          dtype=torch.long)
    cost = torch.cdist(cxcywh(bbox_pred), cxcywh(gt_bboxes), p=1)
    cost_a = torch.cdist(cxcywh(anchor), cxcywh(gt_bboxes), p=1)
    index = torch.topk(cost, k=match_times, dim=0, largest=False)[1]
    index1 = torch.topk(cost_a, k=match_times, dim=0, largest=False)[1]
    indexes = torch.cat((index, index1), dim=1).reshape(-1)

    pred_overlaps = iou_mat(bbox_pred, gt_bboxes)
    anchor_overlaps = iou_mat(anchor, gt_bboxes)
    pred_max_overlaps, _ = pred_overlaps.max(dim=1)

    ignore_idx = pred_max_overlaps > neg_ignore_thr
    assigned_gt_inds[ignore_idx] = -1

    pos_gt_index = torch.arange(0, cost_a.size(1)).repeat(match_times * 2)
    pos_ious = anchor_overlaps[indexes, pos_gt_index]
    pos_ignore_idx = pos_ious < pos_ignore_thr
    pos_gt_index_with_ignore = pos_gt_index + 1
    pos_gt_index_with_ignore[pos_ignore_idx] = -1
    assigned_gt_inds[indexes] = pos_gt_index_with_ignore
    return assigned_gt_inds, ~pos_ignore_idx, indexes, pos_gt_index


# ------------------------------------------------- legacy (MMDet V1.x) coder
def legacy_bbox2delta_t(proposals, gt, means=(0., 0., 0., 0.),
                        stds=(1., 1., 1., 1.)):
    """Lifted from legacy_delta_xywh_bbox_coder.py:97-136 (+1 wh)."""
    proposals = proposals.float()
    gt = gt.float()
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0] + 1.0
    ph = proposals[..., 3] - proposals[..., 1] + 1.0

    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0] + 1.0
    gh = gt[..., 3] - gt[..., 1] + 1.0

    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = torch.log(gw / pw)
    dh = torch.log(gh / ph)
    deltas = torch.stack([dx, dy, dw, dh], dim=-1)
    means = deltas.new_tensor(means).unsqueeze(0)
    stds = deltas.new_tensor(stds).unsqueeze(0)
    return deltas.sub_(means).div_(stds)


def legacy_delta2bbox_t(rois, deltas, means=(0., 0., 0., 0.),
                        stds=(1., 1., 1., 1.), max_shape=None,
                        wh_ratio_clip=16 / 1000):
    """Lifted from legacy_delta_xywh_bbox_coder.py:139-215 (+1 wh, no
    corner -+0.5 per the reference's own deviation, max_shape-1 clamp)."""
    means = deltas.new_tensor(means).repeat(1, deltas.size(1) // 4)
    stds = deltas.new_tensor(stds).repeat(1, deltas.size(1) // 4)
    denorm_deltas = deltas * stds + means
    dx = denorm_deltas[:, 0::4]
    dy = denorm_deltas[:, 1::4]
    dw = denorm_deltas[:, 2::4]
    dh = denorm_deltas[:, 3::4]
    max_ratio = np.abs(np.log(wh_ratio_clip))
    dw = dw.clamp(min=-max_ratio, max=max_ratio)
    dh = dh.clamp(min=-max_ratio, max=max_ratio)
    px = ((rois[:, 0] + rois[:, 2]) * 0.5).unsqueeze(1).expand_as(dx)
    py = ((rois[:, 1] + rois[:, 3]) * 0.5).unsqueeze(1).expand_as(dy)
    pw = (rois[:, 2] - rois[:, 0] + 1.0).unsqueeze(1).expand_as(dw)
    ph = (rois[:, 3] - rois[:, 1] + 1.0).unsqueeze(1).expand_as(dh)
    gw = pw * dw.exp()
    gh = ph * dh.exp()
    gx = px + pw * dx
    gy = py + ph * dy
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        x1 = x1.clamp(min=0, max=max_shape[1] - 1)
        y1 = y1.clamp(min=0, max=max_shape[0] - 1)
        x2 = x2.clamp(min=0, max=max_shape[1] - 1)
        y2 = y2.clamp(min=0, max=max_shape[0] - 1)
    return torch.stack([x1, y1, x2, y2], dim=-1).view_as(deltas)


class LegacyAnchorOracle(AnchorOracle):
    """anchor_generator.py:601-699: centers at offset*(size-1), size-1
    half-extents, rounded base anchors; legacy center_offset=0.5."""

    def __init__(self, strides, ratios=(0.5, 1.0, 2.0), scales=(8.0,),
                 center_offset=0.5):
        super().__init__(strides, ratios=ratios, scales=scales,
                         center_offset=center_offset)

    def gen_base_anchors(self):
        out = []
        for base_size in self.base_sizes:
            w = h = float(base_size)
            x_center = self.center_offset * (w - 1)
            y_center = self.center_offset * (h - 1)
            h_ratios = torch.sqrt(torch.tensor(self.ratios))
            w_ratios = 1 / h_ratios
            scales = torch.tensor(self.scales)
            ws = (w * w_ratios[:, None] * scales[None, :]).view(-1)
            hs = (h * h_ratios[:, None] * scales[None, :]).view(-1)
            base_anchors = [
                x_center - 0.5 * (ws - 1), y_center - 0.5 * (hs - 1),
                x_center + 0.5 * (ws - 1), y_center + 0.5 * (hs - 1)
            ]
            out.append(torch.stack(base_anchors, dim=-1).round())
        return out
