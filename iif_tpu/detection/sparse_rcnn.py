"""Sparse R-CNN, static-shape.

Rebuild of the reference Sparse R-CNN family
(``mmdet/models/detectors/sparse_rcnn.py``, rpn
``mmdet/models/dense_heads/embedding_rpn_head.py``, roi head
``mmdet/models/roi_heads/sparse_roi_head.py``, bbox head
``mmdet/models/roi_heads/bbox_heads/dii_head.py``, DynamicConv
``mmdet/models/utils/transformer.py:1055-1156``, config
``configs/sparse_rcnn/sparse_rcnn_r50_fpn_1x_coco.py``): 100 learnable
proposal boxes + features iterated through 6 Dynamic Instance
Interactive heads (self-attention over proposals, per-proposal dynamic
1x1 convs over the RoI features, FFN, focal cls / L1+GIoU reg with
per-stage Hungarian matching on the detached predictions). No NMS at
inference: the last stage's sigmoid scores are ranked directly.

The per-stage Hungarian rides ``optax.assignment`` (shared with DETR,
detr.py) with the FocalLossCost variant.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from optax import assignment as optax_assignment

from iif_tpu.detection.detr import bbox_cxcywh_to_xyxy, bbox_xyxy_to_cxcywh
from iif_tpu.detection.losses import iou_loss, sigmoid_focal_loss
from iif_tpu.detection.necks import FPN
from iif_tpu.detection.roi_extractor import SingleRoIExtractor
from iif_tpu.detection.single_stage import (
    SSTestCfg,
    SSTrainCfg,
    _DEPTH_LAYERS,
    _SingleStageBase,
    bias_init_with_prob,
)
from iif_tpu.models.resnet import ResNet

_BIG = 1e8
DII_STDS = (0.5, 0.5, 1.0, 1.0)


class DynamicConv(nn.Module):
    """``transformer.py:1055-1156``: per-proposal generated 1x1 conv
    params contract the 7x7 RoI features in two bmm's + LN + ReLU."""
    in_channels: int = 256
    feat_channels: int = 64
    out_channels: int = 256

    @nn.compact
    def __call__(self, param_feat: jnp.ndarray,   # (N, C)
                 roi_feat: jnp.ndarray            # (N, S, S, C)
                 ) -> jnp.ndarray:                # (N, C)
        n, s1, s2, c = roi_feat.shape
        params = nn.Dense(
            self.in_channels * self.feat_channels
            + self.feat_channels * self.out_channels,
            name="dynamic_layer")(param_feat)
        p_in = params[:, :self.in_channels * self.feat_channels].reshape(
            n, self.in_channels, self.feat_channels)
        p_out = params[:, -self.feat_channels * self.out_channels:] \
            .reshape(n, self.feat_channels, self.out_channels)
        x = roi_feat.reshape(n, s1 * s2, c)
        x = nn.relu(nn.LayerNorm(name="norm_in")(
            jnp.einsum("npc,ncf->npf", x, p_in)))
        x = nn.relu(nn.LayerNorm(name="norm_out")(
            jnp.einsum("npf,nfo->npo", x, p_out)))
        x = x.reshape(n, -1)
        x = nn.relu(nn.LayerNorm(name="fc_norm")(
            nn.Dense(self.out_channels, name="fc_layer")(x)))
        return x


class DIIHead(nn.Module):
    """``dii_head.py``: self-attn + dynamic interaction + FFN, then a
    1-fc cls branch (sigmoid focal) and 3-fc reg branch (deltas on the
    current boxes)."""
    num_classes: int
    channels: int = 256
    num_heads: int = 8
    ffn_channels: int = 2048
    num_cls_fcs: int = 1
    num_reg_fcs: int = 3

    @nn.compact
    def __call__(self, roi_feat: jnp.ndarray,     # (B*Q, S, S, C)
                 proposal_feat: jnp.ndarray       # (B, Q, C)
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        b, q, c = proposal_feat.shape
        attn = nn.SelfAttention(num_heads=self.num_heads,
                                qkv_features=self.channels,
                                name="attention")(proposal_feat)
        pf = nn.LayerNorm(name="attention_norm")(proposal_feat + attn)
        pf_flat = pf.reshape(b * q, c)
        iic = DynamicConv(name="instance_interactive_conv")(
            pf_flat, roi_feat)
        obj = nn.LayerNorm(name="iic_norm")(pf_flat + iic)
        ffn = nn.Dense(self.channels, name="ffn_fc2")(
            nn.relu(nn.Dense(self.ffn_channels, name="ffn_fc1")(obj)))
        obj = nn.LayerNorm(name="ffn_norm")(obj + ffn)

        cls_feat = obj
        for i in range(self.num_cls_fcs):
            cls_feat = nn.relu(nn.LayerNorm(name=f"cls_ln{i}")(
                nn.Dense(self.channels, use_bias=False,
                         name=f"cls_fc{i}")(cls_feat)))
        reg_feat = obj
        for i in range(self.num_reg_fcs):
            reg_feat = nn.relu(nn.LayerNorm(name=f"reg_ln{i}")(
                nn.Dense(self.channels, use_bias=False,
                         name=f"reg_fc{i}")(reg_feat)))
        cls_score = nn.Dense(
            self.num_classes,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="fc_cls")(cls_feat).reshape(b, q, -1)
        deltas = nn.Dense(4, name="fc_reg")(reg_feat).reshape(b, q, 4)
        return cls_score, deltas, obj.reshape(b, q, c)


class SparseRCNN(_SingleStageBase):
    """``type='SparseRCNN'``. Uses the single-stage CLI surface (no RPN
    proposals to configure)."""
    num_proposals: int = 100
    num_dii_stages: int = 6

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=4, start_level=0,
                        add_extra_convs="on_input",
                        dtype=self.compute_dtype, name="neck")
        # EmbeddingRPNHead (embedding_rpn_head.py): cxcywh init
        # (.5, .5, 1, 1) = the whole image
        self.init_proposal_bboxes = self.param(
            "init_proposal_bboxes",
            lambda key: jnp.tile(jnp.asarray([[0.5, 0.5, 1.0, 1.0]]),
                                 (self.num_proposals, 1)),
        )
        self.init_proposal_features = self.param(
            "init_proposal_features", nn.initializers.normal(1.0),
            (self.num_proposals, 256))
        self.dii_heads = [DIIHead(self.num_classes, name=f"dii_head_{i}")
                          for i in range(self.num_dii_stages)]

    def init_proposals(self, batch: int, img_hw: Tuple[int, int]):
        whwh = jnp.asarray([img_hw[1], img_hw[0], img_hw[1], img_hw[0]],
                           jnp.float32)
        boxes = bbox_cxcywh_to_xyxy(self.init_proposal_bboxes) * whwh
        boxes = jnp.broadcast_to(boxes[None], (batch,) + boxes.shape)
        feats = jnp.broadcast_to(
            self.init_proposal_features[None],
            (batch,) + self.init_proposal_features.shape)
        return boxes, feats

    def forward_dii(self, roi_feat, proposal_feat, stage: int):
        return self.dii_heads[stage](roi_feat, proposal_feat)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.extract_feat(images, train=train)
        b = images.shape[0]
        boxes, pf = self.init_proposals(b, images.shape[1:3])
        c = feats[0].shape[-1]
        d7 = jnp.zeros((b * self.num_proposals, 7, 7, c))
        outs = []
        for i in range(self.num_dii_stages):
            outs.append(self.dii_heads[i](d7, pf))
        return outs[-1]


def _decode_dii(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """DeltaXYWH decode, stds (0.5, 0.5, 1, 1), clip_border=False."""
    from iif_tpu.ops.boxes import delta2bbox

    return delta2bbox(boxes, deltas, (0, 0, 0, 0), DII_STDS,
                      max_shape=None)


def _focal_hungarian(cls_logits, pred_boxes, gtb, gtl, gtv, img_hw,
                     alpha=0.25, gamma=2.0):
    """HungarianAssigner with FocalLossCost(2) + BBoxL1Cost(5, cxcywh
    normalized) + IoUCost(giou, 2) (``match_cost.py``)."""
    h, w = img_hw[0].astype(jnp.float32), img_hw[1].astype(jnp.float32)
    factor = jnp.stack([w, h, w, h])
    p = jax.nn.sigmoid(cls_logits.astype(jnp.float32))
    eps = 1e-12
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * p ** gamma
    pos = -jnp.log(p + eps) * alpha * (1 - p) ** gamma
    lbl = jnp.clip(gtl, 0, p.shape[1] - 1)
    cls_cost = (pos[:, lbl] - neg[:, lbl]) * 2.0
    pred_norm = bbox_xyxy_to_cxcywh(pred_boxes / factor[None])
    gt_norm = bbox_xyxy_to_cxcywh(gtb / factor[None])
    reg_cost = jnp.abs(pred_norm[:, None] - gt_norm[None]).sum(-1) * 5.0
    giou = 1.0 - iou_loss(
        pred_boxes[:, None, :],
        jnp.broadcast_to(gtb[None], (pred_boxes.shape[0],) + gtb.shape),
        "giou")
    cost = cls_cost + reg_cost + 2.0 * (-giou)
    cost = jnp.where(gtv[None, :], cost, _BIG)
    rows, cols = optax_assignment.hungarian_algorithm(cost)
    take = gtv[cols]
    assigned = jnp.zeros(pred_boxes.shape[0], jnp.int32)
    assigned = assigned.at[rows].set(
        jnp.where(take, cols.astype(jnp.int32) + 1, 0))
    return assigned


def sparse_rcnn_loss(
    model: SparseRCNN,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``sparse_roi_head.py`` forward_train + ``dii_head.py`` loss:
    per-stage Hungarian on detached predictions; focal*2 / num_pos,
    L1*5 (whwh-normalized) and GIoU*2 on positives / num_pos."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=SparseRCNN.extract_feat,
        mutable=["batch_stats"])
    boxes, pf = model.apply(variables, b, (img_h, img_w),
                            method=SparseRCNN.init_proposals)
    q = model.num_proposals
    c = model.num_classes
    img_hw = jnp.asarray([img_h, img_w], jnp.float32)
    whwh = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
    extractor = SingleRoIExtractor((7, 7))
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), q)

    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for stage in range(model.num_dii_stages):
        rois5 = jnp.concatenate(
            [bidx[:, None], boxes.reshape(-1, 4)], axis=1)
        roi_feats = extractor(feats[:4], rois5)
        cls_score, deltas, pf = model.apply(
            variables, roi_feats, pf, stage,
            method=SparseRCNN.forward_dii)
        decoded = _decode_dii(boxes.reshape(-1, 4),
                              deltas.reshape(-1, 4)).reshape(b, q, 4)

        def _one(sc, bx, gtb, gtl, gtv):
            assigned = _focal_hungarian(
                jax.lax.stop_gradient(sc), jax.lax.stop_gradient(bx),
                gtb, gtl, gtv, img_hw)
            is_pos = assigned > 0
            gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
            labels = jnp.where(is_pos, gtl[gt_idx], c)
            l_cls = sigmoid_focal_loss(sc, labels, c, 2.0, 0.25).sum() * 2.0
            tgt = gtb[gt_idx]
            l_l1 = (jnp.abs(bx / whwh - tgt / whwh).sum(-1)
                    * is_pos).sum() * 5.0
            l_iou = (iou_loss(bx, tgt, "giou") * is_pos).sum() * 2.0
            return l_cls, l_l1, l_iou, is_pos.sum()

        lc, ll, li, npos = jax.vmap(_one)(
            cls_score.astype(jnp.float32), decoded,
            batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
        n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
        losses[f"stage{stage}_loss_cls"] = lc.sum() / n
        losses[f"stage{stage}_loss_bbox"] = ll.sum() / n
        losses[f"stage{stage}_loss_iou"] = li.sum() / n
        boxes = jax.lax.stop_gradient(decoded)

    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def sparse_rcnn_simple_test(
    model: SparseRCNN,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``sparse_roi_head.py`` simple_test: run all stages, rank the last
    stage's sigmoid scores over (Q x C) — NO NMS."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=SparseRCNN.extract_feat)
    boxes, pf = model.apply(variables, b, (img_h, img_w),
                            method=SparseRCNN.init_proposals)
    q = model.num_proposals
    extractor = SingleRoIExtractor((7, 7))
    bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), q)
    for stage in range(model.num_dii_stages):
        rois5 = jnp.concatenate(
            [bidx[:, None], boxes.reshape(-1, 4)], axis=1)
        roi_feats = extractor(feats[:4], rois5)
        cls_score, deltas, pf = model.apply(
            variables, roi_feats, pf, stage,
            method=SparseRCNN.forward_dii)
        boxes = _decode_dii(boxes.reshape(-1, 4),
                            deltas.reshape(-1, 4)).reshape(b, q, 4)

    c = model.num_classes
    scores = jax.nn.sigmoid(cls_score.astype(jnp.float32))  # (B, Q, C)
    k = min(cfg.max_per_img, q * c)

    def _one(sc, bx):
        flat = sc.reshape(-1)
        top_s, top_i = jax.lax.top_k(flat, k)
        qi = top_i // c
        labels = (top_i % c).astype(jnp.int32)
        return bx[qi], top_s, labels, top_s > cfg.score_thr

    dets, out_scores, labels, det_valid = jax.vmap(_one)(scores, boxes)
    dets = jnp.stack([
        jnp.clip(dets[..., 0], 0, img_w),
        jnp.clip(dets[..., 1], 0, img_h),
        jnp.clip(dets[..., 2], 0, img_w),
        jnp.clip(dets[..., 3], 0, img_h)], -1)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}
