"""Torch oracles for the Cascade RPN machinery, lifted from the
reference (re-expressed for test use only):

- ``region_assign_t`` — ``mmdet/core/bbox/assigners/region_assigner.py``
  ``RegionAssigner.assign`` (sequential per-gt painting, the exact
  order-dependent semantics).
- ``anchor_offset_t`` — ``mmdet/models/dense_heads/cascade_rpn_head.py``
  ``StageCascadeRPNHead.anchor_offset`` (:327-398).
"""
import torch


def _calc_region(bbox, ratio, stride, featmap_size=None):
    f_bbox = bbox / stride
    x1 = torch.round((1 - ratio) * f_bbox[0] + ratio * f_bbox[2])
    y1 = torch.round((1 - ratio) * f_bbox[1] + ratio * f_bbox[3])
    x2 = torch.round(ratio * f_bbox[0] + (1 - ratio) * f_bbox[2])
    y2 = torch.round(ratio * f_bbox[1] + (1 - ratio) * f_bbox[3])
    if featmap_size is not None:
        x1 = x1.clamp(min=0, max=featmap_size[1])
        y1 = y1.clamp(min=0, max=featmap_size[0])
        x2 = x2.clamp(min=0, max=featmap_size[1])
        y2 = y2.clamp(min=0, max=featmap_size[0])
    return (x1, y1, x2, y2)


def _ctr_inside(anchors, stride, region):
    x1, y1, x2, y2 = region
    f = anchors / stride
    x = (f[:, 0] + f[:, 2]) * 0.5
    y = (f[:, 1] + f[:, 3]) * 0.5
    return (x >= x1) & (x <= x2) & (y >= y1) & (y <= y2)


def region_assign_t(mlvl_anchors, featmap_sizes, gt_bboxes,
                    anchor_scale=8, anchor_strides=(4, 8, 16, 32, 64),
                    center_ratio=0.2, ignore_ratio=0.5):
    """Sequential-paint region assignment; returns flat long tensor
    (-1 ignore / 0 neg / gt+1). No valid-flag masking (allowed_border=-1
    keeps every in-grid anchor)."""
    num_lvls = len(mlvl_anchors)
    r1 = (1 - center_ratio) / 2
    r2 = (1 - ignore_ratio) / 2
    scale = torch.sqrt((gt_bboxes[:, 2] - gt_bboxes[:, 0]) *
                       (gt_bboxes[:, 3] - gt_bboxes[:, 1]))
    min_anchor_size = scale.new_full(
        (1, ), float(anchor_scale * anchor_strides[0]))
    target_lvls = torch.floor(
        torch.log2(scale) - torch.log2(min_anchor_size) + 0.5)
    target_lvls = target_lvls.clamp(min=0, max=num_lvls - 1).long()

    mlvl_assigned = []
    mlvl_ignore = []
    for lvl in range(num_lvls):
        h, w = featmap_sizes[lvl]
        assert h * w == mlvl_anchors[lvl].shape[0]
        mlvl_assigned.append(gt_bboxes.new_full((h * w, ), 0,
                                                dtype=torch.long))
        mlvl_ignore.append(torch.zeros(h * w, dtype=torch.bool))

    for gt_id in range(gt_bboxes.shape[0]):
        lvl = target_lvls[gt_id].item()
        featmap_size = featmap_sizes[lvl]
        stride = anchor_strides[lvl]
        anchors = mlvl_anchors[lvl]
        gt_bbox = gt_bboxes[gt_id, :4]

        ignore_region = _calc_region(gt_bbox, r2, stride, featmap_size)
        ctr_region = _calc_region(gt_bbox, r1, stride, featmap_size)
        mlvl_assigned[lvl][_ctr_inside(anchors, stride, ignore_region)] = -1
        mlvl_assigned[lvl][_ctr_inside(anchors, stride, ctr_region)] = \
            gt_id + 1

        if lvl > 0:
            d = lvl - 1
            reg = _calc_region(gt_bbox, r2, anchor_strides[d],
                               featmap_sizes[d])
            mlvl_ignore[d] |= _ctr_inside(mlvl_anchors[d],
                                          anchor_strides[d], reg)
        if lvl < num_lvls - 1:
            u = lvl + 1
            reg = _calc_region(gt_bbox, r2, anchor_strides[u],
                               featmap_sizes[u])
            mlvl_ignore[u] |= _ctr_inside(mlvl_anchors[u],
                                          anchor_strides[u], reg)

    for lvl in range(num_lvls):
        mlvl_assigned[lvl][mlvl_ignore[lvl]] = -1
    return torch.cat(mlvl_assigned)


def anchor_offset_t(anchors, stride, featmap_size, ks=3, dilation=1):
    """Per-cell deform-conv offsets, one anchor per cell; anchors
    (H*W, 4). Returns (H*W, 2*ks*ks) in (y0, x0, y1, x1, ...) order."""
    feat_h, feat_w = featmap_size
    assert len(anchors) == feat_h * feat_w
    dtype = anchors.dtype

    pad = (ks - 1) // 2
    idx = torch.arange(-pad, pad + 1, dtype=dtype)
    yy, xx = torch.meshgrid(idx, idx)
    xx = xx.reshape(-1)
    yy = yy.reshape(-1)
    w = (anchors[:, 2] - anchors[:, 0]) / stride
    h = (anchors[:, 3] - anchors[:, 1]) / stride
    w = w / (ks - 1) - dilation
    h = h / (ks - 1) - dilation
    offset_x = w[:, None] * xx
    offset_y = h[:, None] * yy

    x = (anchors[:, 0] + anchors[:, 2]) * 0.5 / stride
    y = (anchors[:, 1] + anchors[:, 3]) * 0.5 / stride
    xg = torch.arange(0, feat_w).repeat(feat_h).type_as(x)
    yg = torch.arange(0, feat_h).repeat_interleave(feat_w).type_as(y)
    c_offset_x = x - xg
    c_offset_y = y - yg

    offset_x = offset_x + c_offset_x[:, None]
    offset_y = offset_y + c_offset_y[:, None]
    offset = torch.stack([offset_y, offset_x], dim=-1)
    return offset.reshape(offset.size(0), -1)
