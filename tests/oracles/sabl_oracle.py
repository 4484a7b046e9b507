"""Torch oracle for the SABL bucketing coder — the reference's
``bbox2bucket``/``bucket2bbox`` math
(``mmdet/core/bbox/coder/bucketing_bbox_coder.py:96-352``) lifted
verbatim-in-semantics (pure torch, no mmcv deps) for differential
testing of ``iif_tpu/detection/sabl.py``."""
import numpy as np
import torch
import torch.nn.functional as F


def bbox_rescale_t(bboxes, scale_factor=1.0):
    cx = (bboxes[:, 0] + bboxes[:, 2]) * 0.5
    cy = (bboxes[:, 1] + bboxes[:, 3]) * 0.5
    w = (bboxes[:, 2] - bboxes[:, 0]) * scale_factor
    h = (bboxes[:, 3] - bboxes[:, 1]) * scale_factor
    return torch.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], dim=-1)


def generat_buckets_t(proposals, num_buckets, scale_factor=1.0):
    proposals = bbox_rescale_t(proposals, scale_factor)
    side_num = int(np.ceil(num_buckets / 2.0))
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    bucket_w = pw / num_buckets
    bucket_h = ph / num_buckets
    steps = (0.5 + torch.arange(0, side_num).float())[None, :]
    l_buckets = proposals[..., 0][:, None] + steps * bucket_w[:, None]
    r_buckets = proposals[..., 2][:, None] - steps * bucket_w[:, None]
    t_buckets = proposals[..., 1][:, None] + steps * bucket_h[:, None]
    d_buckets = proposals[..., 3][:, None] - steps * bucket_h[:, None]
    return bucket_w, bucket_h, l_buckets, r_buckets, t_buckets, d_buckets


def bbox2bucket_t(proposals, gt, num_buckets, scale_factor,
                  offset_topk=2, offset_upperbound=1.0,
                  cls_ignore_neighbor=True):
    (bucket_w, bucket_h, l_buckets, r_buckets, t_buckets,
     d_buckets) = generat_buckets_t(proposals.float(), num_buckets,
                                    scale_factor)
    gt = gt.float()
    l_offsets = (l_buckets - gt[..., 0][:, None]) / bucket_w[:, None]
    r_offsets = (r_buckets - gt[..., 2][:, None]) / bucket_w[:, None]
    t_offsets = (t_buckets - gt[..., 1][:, None]) / bucket_h[:, None]
    d_offsets = (d_buckets - gt[..., 3][:, None]) / bucket_h[:, None]

    sides = [l_offsets, r_offsets, t_offsets, d_offsets]
    weights, labels0 = [], []
    inds = torch.arange(proposals.size(0)).long()
    for o in sides:
        topk, label = o.abs().topk(offset_topk, dim=1, largest=False,
                                   sorted=True)
        w = o.new_zeros(o.size())
        for k in range(offset_topk):
            if k >= 1:
                w[inds, label[:, k]] = (topk[:, k] <
                                        offset_upperbound).float()
            else:
                w[inds, label[:, k]] = 1.0
        weights.append(w)
        labels0.append(label[:, 0])

    offsets = torch.cat(sides, dim=-1)
    offsets_weights = torch.cat(weights, dim=-1)
    side_num = int(np.ceil(num_buckets / 2.0))
    labels = torch.stack(labels0, dim=-1)
    bucket_labels = F.one_hot(labels.view(-1), side_num).view(
        labels.size(0), -1).float()
    bucket_cls_weights = torch.cat([(o.abs() < 1).float() for o in sides],
                                   dim=-1)
    if cls_ignore_neighbor:
        bucket_cls_weights = (~((bucket_cls_weights == 1) &
                                (bucket_labels == 0))).float()
    else:
        bucket_cls_weights[:] = 1.0
    return offsets, offsets_weights, bucket_labels, bucket_cls_weights


def bucket2bbox_t(proposals, cls_preds, offset_preds, num_buckets,
                  scale_factor=1.0, max_shape=None):
    side_num = int(np.ceil(num_buckets / 2.0))
    cls_preds = cls_preds.view(-1, side_num)
    offset_preds = offset_preds.view(-1, side_num)
    scores = F.softmax(cls_preds, dim=1)
    score_topk, score_label = scores.topk(2, dim=1, largest=True,
                                          sorted=True)
    rescaled = bbox_rescale_t(proposals, scale_factor)
    pw = rescaled[..., 2] - rescaled[..., 0]
    ph = rescaled[..., 3] - rescaled[..., 1]
    bucket_w = pw / num_buckets
    bucket_h = ph / num_buckets

    score_inds_l = score_label[0::4, 0]
    score_inds_r = score_label[1::4, 0]
    score_inds_t = score_label[2::4, 0]
    score_inds_d = score_label[3::4, 0]
    l_buckets = rescaled[..., 0] + (0.5 + score_inds_l.float()) * bucket_w
    r_buckets = rescaled[..., 2] - (0.5 + score_inds_r.float()) * bucket_w
    t_buckets = rescaled[..., 1] + (0.5 + score_inds_t.float()) * bucket_h
    d_buckets = rescaled[..., 3] - (0.5 + score_inds_d.float()) * bucket_h

    offsets = offset_preds.view(-1, 4, side_num)
    inds = torch.arange(proposals.size(0)).long()
    l_offsets = offsets[:, 0, :][inds, score_inds_l]
    r_offsets = offsets[:, 1, :][inds, score_inds_r]
    t_offsets = offsets[:, 2, :][inds, score_inds_t]
    d_offsets = offsets[:, 3, :][inds, score_inds_d]

    x1 = l_buckets - l_offsets * bucket_w
    x2 = r_buckets - r_offsets * bucket_w
    y1 = t_buckets - t_offsets * bucket_h
    y2 = d_buckets - d_offsets * bucket_h
    if max_shape is not None:
        x1 = x1.clamp(min=0, max=max_shape[1] - 1)
        y1 = y1.clamp(min=0, max=max_shape[0] - 1)
        x2 = x2.clamp(min=0, max=max_shape[1] - 1)
        y2 = y2.clamp(min=0, max=max_shape[0] - 1)
    bboxes = torch.stack([x1, y1, x2, y2], dim=-1)

    loc_confidence = score_topk[:, 0]
    top2_neighbor = (score_label[:, 0] - score_label[:, 1]).abs() == 1
    loc_confidence = loc_confidence + score_topk[:, 1] * \
        top2_neighbor.float()
    return bboxes, loc_confidence.view(-1, 4).mean(dim=1)
