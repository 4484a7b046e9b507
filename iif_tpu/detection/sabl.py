"""SABL: Side-Aware Boundary Localization (ECCV 2020).

TPU-native rebuild of the reference's bucketing coder
(``mmdet/core/bbox/coder/bucketing_bbox_coder.py``) and the SABL RoI
bbox head (``mmdet/models/roi_heads/bbox_heads/sabl_head.py``,
``configs/sabl/sabl_faster_rcnn_r50_fpn_1x_coco.py``): each box side is
localized by classifying which of ``ceil(num_buckets/2)`` buckets the
boundary falls in, plus a fine within-bucket offset regression; at
inference the top-2 bucket scores produce a localization confidence
that rescores the classification (bucketing-guided rescoring).

The reference's encode loops over top-k with index_put_; here the
offset-weight scatter is a sum of one-hots, and the whole coder is
batched jnp (no per-side python).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.losses import smooth_l1_loss


def bbox_rescale(boxes: jnp.ndarray, scale_factor: float) -> jnp.ndarray:
    """Scale boxes around their centers (``transforms.py:190-218``)."""
    cx = (boxes[:, 0] + boxes[:, 2]) * 0.5
    cy = (boxes[:, 1] + boxes[:, 3]) * 0.5
    w = (boxes[:, 2] - boxes[:, 0]) * scale_factor
    h = (boxes[:, 3] - boxes[:, 1]) * scale_factor
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h,
                      cx + 0.5 * w, cy + 0.5 * h], axis=1)


def _buckets(proposals: jnp.ndarray, num_buckets: int, scale_factor: float):
    """(bucket_w, bucket_h, l/r/t/d bucket centers)
    (``bucketing_bbox_coder.py:96-142``)."""
    p = bbox_rescale(proposals, scale_factor)
    side = int(np.ceil(num_buckets / 2.0))
    pw = p[:, 2] - p[:, 0]
    ph = p[:, 3] - p[:, 1]
    bw = pw / num_buckets
    bh = ph / num_buckets
    steps = 0.5 + jnp.arange(side, dtype=jnp.float32)
    l = p[:, 0, None] + steps[None] * bw[:, None]
    r = p[:, 2, None] - steps[None] * bw[:, None]
    t = p[:, 1, None] + steps[None] * bh[:, None]
    d = p[:, 3, None] - steps[None] * bh[:, None]
    return bw, bh, l, r, t, d


def bbox2bucket(proposals: jnp.ndarray, gt: jnp.ndarray,
                num_buckets: int = 14, scale_factor: float = 1.7,
                offset_topk: int = 2, offset_upperbound: float = 1.0,
                cls_ignore_neighbor: bool = True):
    """Encode (``bbox2bucket``, ``bucketing_bbox_coder.py:145-263``):
    returns (offsets, offset_weights, bucket_labels, bucket_cls_weights),
    each (n, 4*side)."""
    side = int(np.ceil(num_buckets / 2.0))
    bw, bh, l, r, t, d = _buckets(proposals, num_buckets, scale_factor)
    offs = [
        (l - gt[:, 0, None]) / bw[:, None],
        (r - gt[:, 2, None]) / bw[:, None],
        (t - gt[:, 1, None]) / bh[:, None],
        (d - gt[:, 3, None]) / bh[:, None],
    ]

    def _side(o):
        # top-k NEAREST buckets get offset-regression weight: the nearest
        # unconditionally, the rest only within the upperbound
        topk, label = jax.lax.top_k(-jnp.abs(o), offset_topk)
        topk = -topk
        w = jax.nn.one_hot(label[:, 0], side)
        for k in range(1, offset_topk):
            w = w + jax.nn.one_hot(label[:, k], side) * (
                topk[:, k] < offset_upperbound)[:, None]
        cls_label = jax.nn.one_hot(label[:, 0], side)
        cls_w = (jnp.abs(o) < 1.0).astype(jnp.float32)
        return w, cls_label, cls_w

    ws, labels, cws = zip(*[_side(o) for o in offs])
    offsets = jnp.concatenate(offs, axis=-1)
    offset_weights = jnp.concatenate(ws, axis=-1)
    bucket_labels = jnp.concatenate(labels, axis=-1)
    cls_weights = jnp.concatenate(cws, axis=-1)
    if cls_ignore_neighbor:
        cls_weights = (~((cls_weights == 1) & (bucket_labels == 0))
                       ).astype(jnp.float32)
    else:
        cls_weights = jnp.ones_like(cls_weights)
    return offsets, offset_weights, bucket_labels, cls_weights


def bucket2bbox(proposals: jnp.ndarray, cls_preds: jnp.ndarray,
                offset_preds: jnp.ndarray, num_buckets: int = 14,
                scale_factor: float = 1.7,
                max_shape: Optional[Tuple[int, int]] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode + bucketing-guided rescoring
    (``bucket2bbox``, ``bucketing_bbox_coder.py:266-352``): returns
    (boxes (n, 4), loc_confidence (n,))."""
    side = int(np.ceil(num_buckets / 2.0))
    n = proposals.shape[0]
    scores = jax.nn.softmax(
        cls_preds.astype(jnp.float32).reshape(n, 4, side), axis=-1)
    top2, label2 = jax.lax.top_k(scores, 2)

    p = bbox_rescale(proposals, scale_factor)
    bw = (p[:, 2] - p[:, 0]) / num_buckets
    bh = (p[:, 3] - p[:, 1]) / num_buckets
    ind = label2[..., 0]                                   # (n, 4)
    l_b = p[:, 0] + (0.5 + ind[:, 0]) * bw
    r_b = p[:, 2] - (0.5 + ind[:, 1]) * bw
    t_b = p[:, 1] + (0.5 + ind[:, 2]) * bh
    d_b = p[:, 3] - (0.5 + ind[:, 3]) * bh

    off = offset_preds.astype(jnp.float32).reshape(n, 4, side)
    sel = jnp.take_along_axis(off, ind[..., None], axis=-1)[..., 0]
    x1 = l_b - sel[:, 0] * bw
    x2 = r_b - sel[:, 1] * bw
    y1 = t_b - sel[:, 2] * bh
    y2 = d_b - sel[:, 3] * bh
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1] - 1)
        x2 = jnp.clip(x2, 0, max_shape[1] - 1)
        y1 = jnp.clip(y1, 0, max_shape[0] - 1)
        y2 = jnp.clip(y2, 0, max_shape[0] - 1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=1)

    conf = top2[..., 0] + top2[..., 1] * (
        jnp.abs(label2[..., 0] - label2[..., 1]) == 1)
    return boxes, conf.mean(axis=-1)


class SABLHead(nn.Module):
    """SABL RoI bbox head (``sabl_head.py:16-322``): a cls fc branch and
    a side-aware reg branch — 2 pre 3x3 convs, attention pooling into an
    x-row and a y-column, 3x1/1x3 post convs, 1-D transposed-conv 2x
    upsample, shared per-position fcs emitting one bucket logit and one
    offset per position, side-aware split into [near-edge .. center]
    order."""

    num_classes: int
    num_buckets: int = 14
    cls_out_channels: int = 1024
    reg_pre_num: int = 2
    reg_post_num: int = 1
    up_ratio: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray],
                            jnp.ndarray]:
        n, s, _, c = x.shape
        xavier = nn.initializers.xavier_uniform()
        # ------------------------------------------------------ cls branch
        cls_x = x.reshape(n, -1)
        cls_x = nn.relu(nn.Dense(self.cls_out_channels, kernel_init=xavier,
                                 name="cls_fc0")(cls_x))
        cls_score = nn.Dense(self.num_classes + 1,
                             kernel_init=nn.initializers.normal(0.01),
                             name="fc_cls")(cls_x)

        # ------------------------------------------------------ reg branch
        reg = x
        for i in range(self.reg_pre_num):
            reg = nn.relu(nn.Conv(c, (3, 3), name=f"reg_pre{i}")(reg))
        # attention pooling (sabl_head.py:226-239): fx sums rows (y),
        # fy sums columns (x)
        att_x = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.normal(0.01),
            name="att_x")(reg))
        att_y = jax.nn.sigmoid(nn.Conv(
            1, (1, 1), kernel_init=nn.initializers.normal(0.01),
            name="att_y")(reg))
        att_x = att_x / att_x.sum(axis=1, keepdims=True)
        att_y = att_y / att_y.sum(axis=2, keepdims=True)
        fx = (reg * att_x).sum(axis=1)              # (n, W, C)
        fy = (reg * att_y).sum(axis=2)              # (n, H, C)
        for i in range(self.reg_post_num):
            fx = nn.relu(nn.Conv(c, (3,), name=f"post_x{i}")(fx))
            fy = nn.relu(nn.Conv(c, (3,), name=f"post_y{i}")(fy))
        if self.up_ratio > 1:
            fx = nn.relu(nn.ConvTranspose(
                c, (self.up_ratio,), strides=(self.up_ratio,),
                name="upsample_x")(fx))
            fy = nn.relu(nn.ConvTranspose(
                c, (self.up_ratio,), strides=(self.up_ratio,),
                name="upsample_y")(fy))

        up = s * self.up_ratio

        # per-position 1-logit heads SHARED between the x and y branches
        # (sabl_head.py:261-278)
        fc_off = nn.Dense(1, kernel_init=nn.initializers.normal(0.001),
                          name="fc_reg_offset")
        fc_cls_r = nn.Dense(1, kernel_init=nn.initializers.normal(0.01),
                            name="fc_reg_cls")
        off_x, cls_x_r = fc_off(fx)[..., 0], fc_cls_r(fx)[..., 0]
        off_y, cls_y_r = fc_off(fy)[..., 0], fc_cls_r(fy)[..., 0]

        def _split(feat):
            # [left half, flipped right half] (sabl_head.py:280-291)
            l_end = int(np.ceil(up / 2))
            r_start = int(np.floor(up / 2))
            return jnp.concatenate(
                [feat[:, :l_end], feat[:, r_start:][:, ::-1]], axis=-1)

        bucket_offsets = jnp.concatenate([_split(off_x), _split(off_y)],
                                         axis=-1)
        bucket_cls = jnp.concatenate([_split(cls_x_r), _split(cls_y_r)],
                                     axis=-1)
        return cls_score, (bucket_cls, bucket_offsets), cls_x


def sabl_bbox_loss(
    bucket_cls_preds: jnp.ndarray,     # (N, 4*side)
    bucket_offset_preds: jnp.ndarray,  # (N, 4*side)
    rois: jnp.ndarray,                 # (N, 4) sampled proposals
    gt_boxes: jnp.ndarray,             # (N, 4) matched gts (pos rows)
    pos_mask: jnp.ndarray,             # (N,)
    num_buckets: int = 14,
    scale_factor: float = 1.7,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bucket-cls BCE + offset SmoothL1(beta=0.1), both averaged by the
    row count as in ``sabl_head.py:448-468`` (cls over (N*4, side) rows,
    reg over N rows)."""
    off_t, off_w, b_labels, b_cls_w = bbox2bucket(
        rois, gt_boxes, num_buckets, scale_factor)
    posf = pos_mask.astype(jnp.float32)[:, None]
    off_w = off_w * posf
    b_cls_w = b_cls_w * posf

    p = bucket_cls_preds.astype(jnp.float32)
    bce = (jnp.maximum(p, 0) - p * b_labels
           + jnp.log1p(jnp.exp(-jnp.abs(p))))
    n4 = bucket_cls_preds.shape[0] * 4
    l_bbox_cls = (bce * b_cls_w).sum() / n4

    sl1 = smooth_l1_loss(bucket_offset_preds.astype(jnp.float32), off_t,
                         beta=0.1)
    l_bbox_reg = (sl1 * off_w).sum() / bucket_cls_preds.shape[0]
    return l_bbox_cls, l_bbox_reg
