"""DETR detector (ResNet-C5 + encoder/decoder transformer + Hungarian
set matching), static-shape and MXU-friendly.

Rebuild of the reference's DETR family
(``configs/detr/detr_r50_8x2_150e_coco.py``, head
``mmdet/models/dense_heads/detr_head.py``, transformer
``mmdet/models/utils/transformer.py`` (DetrTransformerEncoder/Decoder,
post-norm BaseTransformerLayer order), positional encoding
``mmdet/models/utils/positional_encoding.py`` SinePositionalEncoding,
assigner ``mmdet/core/bbox/assigners/hungarian_assigner.py`` + match
costs ``mmdet/core/bbox/match_costs/match_cost.py``):

- C5-only backbone -> 1x1 input_proj to 256d -> 6-layer post-norm
  encoder (q = k = x + sine pos) -> 6-layer decoder (100 learned
  queries, self-attn + cross-attn, return-intermediate with a shared
  post-norm) -> fc_cls (C+1 softmax) and a 2-fc reg FFN -> sigmoid
  normalized (cx, cy, w, h).
- Hungarian matching on cost = -softmax(cls)[label] + 5 * L1(cxcywh,
  normalized gt) + 2 * (-GIoU); here via ``optax.assignment``'s jittable
  Hungarian (the reference round-trips to scipy on CPU every step —
  a host sync the TPU build does in-graph).
- Losses per decoder layer (aux deep supervision): CE with background
  weight 0.1 (avg by num_pos + 0.1 * num_neg), L1 x5 and GIoU x2 on
  matched pairs (avg by num_pos).

Attention runs as batched MXU matmuls (flax MultiHeadDotProductAttention)
with key-padding masks derived from the static canvas' per-image valid
region — no dynamic shapes anywhere.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from optax import assignment as optax_assignment

from iif_tpu.detection.losses import iou_loss, l1_loss
from iif_tpu.models.resnet import ResNet

from iif_tpu.detection.detector import _DEPTH_LAYERS  # noqa: E402  (canonical table)

_BIG = 1e6


# ------------------------------------------------------------ positional
def sine_positional_encoding(mask: jnp.ndarray, num_feats: int = 128,
                             temperature: float = 10000.0,
                             eps: float = 1e-6) -> jnp.ndarray:
    """``positional_encoding.py`` SinePositionalEncoding(normalize=True,
    scale=2pi). ``mask`` (B, H, W) True = padding. Returns
    (B, H, W, 2*num_feats)."""
    not_mask = (~mask).astype(jnp.float32)
    y = jnp.cumsum(not_mask, axis=1)
    x = jnp.cumsum(not_mask, axis=2)
    scale = 2.0 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = temperature ** (
        2.0 * (jnp.arange(num_feats) // 2).astype(jnp.float32) / num_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]),
                       jnp.cos(pos_x[..., 1::2])], axis=-1).reshape(
        x.shape + (num_feats,))
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]),
                       jnp.cos(pos_y[..., 1::2])], axis=-1).reshape(
        y.shape + (num_feats,))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


# ------------------------------------------------------------ transformer
class FFN(nn.Module):
    """mmcv FFN: Linear(d->ffn) + ReLU + Dropout, Linear(ffn->d) +
    Dropout, residual added by the caller layer."""
    embed_dims: int = 256
    feedforward_channels: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.feedforward_channels, name="fc1")(x))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.embed_dims, name="fc2")(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class EncoderLayer(nn.Module):
    """Post-norm DETR encoder layer (operation_order self_attn, norm,
    ffn, norm); q = k = x + pos, v = x."""
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, pos, key_mask, train: bool = False):
        q = k = x + pos
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout,
            name="self_attn")(q, k, x, mask=key_mask,
                              deterministic=not train)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        x = nn.LayerNorm(name="norm1")(x + att)
        x = nn.LayerNorm(name="norm2")(
            x + FFN(self.embed_dims, dropout=self.dropout,
                    name="ffn")(x, train))
        return x


class DecoderLayer(nn.Module):
    """Post-norm DETR decoder layer (self_attn, norm, cross_attn, norm,
    ffn, norm); query pos added to q/k of both attentions."""
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, tgt, query_pos, memory, mem_pos, key_mask,
                 train: bool = False):
        q = k = tgt + query_pos
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout,
            name="self_attn")(q, k, tgt, deterministic=not train)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        tgt = nn.LayerNorm(name="norm1")(tgt + att)
        att = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dropout_rate=self.dropout,
            name="cross_attn")(tgt + query_pos, memory + mem_pos, memory,
                               mask=key_mask, deterministic=not train)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        tgt = nn.LayerNorm(name="norm2")(tgt + att)
        tgt = nn.LayerNorm(name="norm3")(
            tgt + FFN(self.embed_dims, dropout=self.dropout,
                      name="ffn")(tgt, train))
        return tgt


class DETRHead(nn.Module):
    """``detr_head.py:18-266``: input_proj + transformer + classifier +
    reg FFN; returns (all_cls (L, B, Q, C+1), all_bbox (L, B, Q, 4))."""
    num_classes: int
    num_query: int = 100
    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_reg_fcs: int = 2
    dropout: float = 0.1
    dtype: object = None

    @nn.compact
    def __call__(self, feat: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, fh, fw, _ = feat.shape
        x = nn.Conv(self.embed_dims, (1, 1), name="input_proj")(
            feat.astype(jnp.float32))
        pos = sine_positional_encoding(mask, self.embed_dims // 2)
        hw = fh * fw
        x = x.reshape(b, hw, self.embed_dims)
        pos = pos.reshape(b, hw, self.embed_dims)
        # flax attention mask: (B, 1, Q, K) True = attend
        key_ok = ~mask.reshape(b, hw)
        enc_mask = key_ok[:, None, None, :]

        for i in range(self.num_encoder_layers):
            x = EncoderLayer(self.embed_dims, self.num_heads, self.dropout,
                             name=f"encoder_{i}")(x, pos, enc_mask, train)

        query_pos = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_query, self.embed_dims))
        query_pos_b = jnp.broadcast_to(
            query_pos[None], (b, self.num_query, self.embed_dims))
        tgt = jnp.zeros_like(query_pos_b)
        dec_mask = key_ok[:, None, None, :]

        inters = []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(self.embed_dims, self.num_heads,
                               self.dropout, name=f"decoder_{i}")(
                tgt, query_pos_b, x, pos, dec_mask, train)
            inters.append(tgt)
        post = nn.LayerNorm(name="post_norm")
        outs = jnp.stack([post(t) for t in inters])      # (L, B, Q, D)

        fc_cls = nn.Dense(self.num_classes + 1, name="fc_cls")
        reg_branch = [nn.Dense(self.embed_dims, name=f"reg_ffn_{i}")
                      for i in range(self.num_reg_fcs)]
        fc_reg = nn.Dense(4, name="fc_reg")
        all_cls = fc_cls(outs)
        r = outs
        for fc in reg_branch:
            r = nn.relu(fc(r))
        all_bbox = jax.nn.sigmoid(fc_reg(r))
        return all_cls, all_bbox


class DETR(nn.Module):
    """DETR R50 (``detr_r50_8x2_150e_coco.py``: C5 only, frozen stage 1,
    BN frozen/eval)."""
    num_classes: int = 80
    depth: int = 50
    num_query: int = 100
    frozen_stages: int = 1
    norm_eval: bool = True
    backbone_remat: bool = False
    compute_dtype: object = None
    with_mask: bool = False

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.head = DETRHead(self.num_classes, num_query=self.num_query,
                             dtype=self.compute_dtype, name="bbox_head")

    def __call__(self, images: jnp.ndarray, img_shape: jnp.ndarray,
                 train: bool = False):
        """``img_shape`` (B, 2) valid (h, w) of each padded canvas."""
        from iif_tpu.detection.detector import normalize_if_uint8

        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        c5 = feats[-1]
        b, fh, fw, _ = c5.shape
        # feature-level padding mask from the image-level valid region
        # (the reference downsamples the image mask with F.interpolate;
        # at /32 that's exactly a ceil-division grid test)
        yy = jnp.arange(fh)[None, :, None]
        xx = jnp.arange(fw)[None, None, :]
        vh = -(-img_shape[:, 0] // 32)
        vw = -(-img_shape[:, 1] // 32)
        mask = ~((yy < vh[:, None, None]) & (xx < vw[:, None, None]))
        return self.head(c5, mask, train=train)


# --------------------------------------------------------------- matching
def bbox_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w * 0.5, cy - h * 0.5,
                      cx + w * 0.5, cy + h * 0.5], axis=-1)


def bbox_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) * 0.5, (y1 + y2) * 0.5,
                      x2 - x1, y2 - y1], axis=-1)


def hungarian_match(cls_logits: jnp.ndarray,     # (Q, C+1)
                    bbox_pred: jnp.ndarray,      # (Q, 4) normalized cxcywh
                    gt_boxes: jnp.ndarray,       # (G, 4) xyxy pixels, padded
                    gt_labels: jnp.ndarray,      # (G,)
                    gt_valid: jnp.ndarray,       # (G,) bool
                    img_hw: jnp.ndarray,         # (2,) valid h, w
                    cls_weight: float = 1.0,
                    reg_weight: float = 5.0,
                    iou_weight: float = 2.0,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``hungarian_assigner.py:53-146`` with the DETR cost
    (ClassificationCost + BBoxL1Cost(xywh) + IoUCost(giou)), padded
    static shape: every gt column (including padding) gets one query via
    the rectangular Hungarian; padded columns carry a flat huge cost so
    they soak up arbitrary leftover queries and are masked afterwards.

    Returns (assigned (Q,) 0=bg / g+1, num_pos)."""
    h, w = img_hw[0].astype(jnp.float32), img_hw[1].astype(jnp.float32)
    factor = jnp.stack([w, h, w, h])
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
    cls_cost = -probs[:, jnp.clip(gt_labels, 0, probs.shape[1] - 1)]
    gt_norm = bbox_xyxy_to_cxcywh(gt_boxes / factor[None, :])
    reg_cost = jnp.abs(bbox_pred[:, None, :]
                       - gt_norm[None, :, :]).sum(-1)
    pred_xyxy = bbox_cxcywh_to_xyxy(bbox_pred) * factor[None, :]
    giou = 1.0 - iou_loss(pred_xyxy[:, None, :],
                          jnp.broadcast_to(gt_boxes[None, :, :],
                                           (bbox_pred.shape[0],)
                                           + gt_boxes.shape), "giou")
    cost = (cls_weight * cls_cost + reg_weight * reg_cost
            + iou_weight * (-giou))
    cost = jnp.where(gt_valid[None, :], cost, _BIG)
    rows, cols = optax_assignment.hungarian_algorithm(cost)
    # rows[k] matched to gt cols[k]; scatter into per-query assignment
    take = gt_valid[cols]
    assigned = jnp.zeros(bbox_pred.shape[0], jnp.int32)
    assigned = assigned.at[rows].set(
        jnp.where(take, cols.astype(jnp.int32) + 1, 0))
    return assigned, gt_valid.sum().astype(jnp.int32)


# ------------------------------------------------------------------- loss
def _detr_layer_loss(cls_logits, bbox_pred, gtb, gtl, gtv, img_hw,
                     num_classes, bg_cls_weight=0.1):
    """Single-image, single-decoder-layer loss triple
    (``detr_head.py:334-419`` loss_single, un-batched)."""
    q = cls_logits.shape[0]
    assigned, _ = hungarian_match(
        jax.lax.stop_gradient(cls_logits),
        jax.lax.stop_gradient(bbox_pred), gtb, gtl, gtv, img_hw)
    is_pos = assigned > 0
    gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
    labels = jnp.where(is_pos, gtl[gt_idx], num_classes)

    logp = jax.nn.log_softmax(cls_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    class_w = jnp.where(labels == num_classes, bg_cls_weight, 1.0)
    npos = is_pos.sum().astype(jnp.float32)
    l_cls = (ce * class_w).sum()
    cls_avg = npos + bg_cls_weight * (q - npos)

    h, wd = img_hw[0].astype(jnp.float32), img_hw[1].astype(jnp.float32)
    factor = jnp.stack([wd, h, wd, h])
    gt_of = gtb[gt_idx]
    tgt_norm = bbox_xyxy_to_cxcywh(gt_of / factor[None, :])
    l_bbox = (l1_loss(bbox_pred, tgt_norm).sum(-1) * is_pos).sum() * 5.0
    pred_xyxy = bbox_cxcywh_to_xyxy(bbox_pred) * factor[None, :]
    l_iou = (iou_loss(pred_xyxy, gt_of, "giou") * is_pos).sum() * 2.0
    return l_cls, cls_avg, l_bbox, l_iou, npos


def detr_loss(
    model: DETR,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    cfg: Any = None,            # uniform API
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Deep-supervised set loss: the last decoder layer plus aux losses
    from every earlier layer (``detr_head.py:268-333``)."""
    images = batch["image"]
    img_shape = batch.get("img_shape")
    if img_shape is None:
        b, ih, iw, _ = images.shape
        img_shape = jnp.tile(jnp.asarray([[ih, iw]], jnp.int32), (b, 1))
    (all_cls, all_bbox), mutated = model.apply(
        variables, images, img_shape, True, mutable=["batch_stats"],
        rngs={"dropout": key})
    c = model.num_classes

    def _layer(cls_l, bbox_l):
        lc, cavg, lb, li, npos = jax.vmap(
            lambda cl, bb, gtb, gtl, gtv, hw: _detr_layer_loss(
                cl, bb, gtb, gtl, gtv, hw, c))(
            cls_l, bbox_l, batch["gt_boxes"], batch["gt_labels"],
            batch["gt_valid"], img_shape)
        n = jnp.maximum(npos.sum(), 1.0)
        return (lc.sum() / jnp.maximum(cavg.sum(), 1.0),
                lb.sum() / n, li.sum() / n)

    losses: Dict[str, jnp.ndarray] = {}
    num_layers = all_cls.shape[0]
    for i in range(num_layers):
        lc, lb, li = _layer(all_cls[i], all_bbox[i])
        if i == num_layers - 1:
            losses["loss_cls"] = lc
            losses["loss_bbox"] = lb
            losses["loss_iou"] = li
        else:
            losses[f"d{i}.loss_cls"] = lc
            losses[f"d{i}.loss_bbox"] = lb
            losses[f"d{i}.loss_iou"] = li
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


# --------------------------------------------------------------- inference
def detr_simple_test(
    model: DETR,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: Any = None,
    scale_factor: Optional[jnp.ndarray] = None,
    img_shape: Optional[jnp.ndarray] = None,
    max_per_img: int = 100,
) -> Dict[str, jnp.ndarray]:
    """``detr_head.py:628-700`` softmax path: per-query max over
    foreground classes, top-``max_per_img``, cxcywh decode, clamp, no
    NMS."""
    b, ih, iw, _ = images.shape
    if img_shape is None:
        img_shape = jnp.tile(jnp.asarray([[ih, iw]], jnp.int32), (b, 1))
    all_cls, all_bbox = model.apply(variables, images, img_shape, False)
    cls_logits = all_cls[-1]                      # (B, Q, C+1)
    bbox_pred = all_bbox[-1]                      # (B, Q, 4)
    probs = jax.nn.softmax(cls_logits, axis=-1)[..., :-1]
    scores = probs.max(-1)
    labels = probs.argmax(-1)
    k = min(max_per_img, scores.shape[1])
    top_s, top_i = jax.lax.top_k(scores, k)
    sel_b = jnp.take_along_axis(bbox_pred, top_i[..., None], axis=1)
    sel_l = jnp.take_along_axis(labels, top_i, axis=1)
    h = img_shape[:, 0].astype(jnp.float32)
    w = img_shape[:, 1].astype(jnp.float32)
    factor = jnp.stack([w, h, w, h], axis=-1)[:, None, :]
    boxes = bbox_cxcywh_to_xyxy(sel_b) * factor
    boxes = jnp.stack([
        jnp.clip(boxes[..., 0], 0, w[:, None]),
        jnp.clip(boxes[..., 1], 0, h[:, None]),
        jnp.clip(boxes[..., 2], 0, w[:, None]),
        jnp.clip(boxes[..., 3], 0, h[:, None])], axis=-1)
    if scale_factor is not None:
        boxes = boxes / scale_factor[:, None, :]
    return {"boxes": boxes, "scores": top_s, "labels": sel_l,
            "valid": jnp.ones_like(top_s, bool)}
