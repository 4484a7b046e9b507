"""Deformable DETR, static-shape.

Rebuild of the reference Deformable-DETR family
(``mmdet/models/detectors/deformable_detr.py``, head
``mmdet/models/dense_heads/deformable_detr_head.py``, transformer
``mmdet/models/utils/transformer.py:625-900``, neck ChannelMapper
``mmdet/models/necks/channel_mapper.py``, config
``configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py``,
as_two_stage=False, with_box_refine=False): C3-C5 + an extra stride-64
level through 1x1+GN ChannelMapper; a 6-layer encoder whose self
attention is MULTI-SCALE DEFORMABLE (4 points x 4 levels x 8 heads
around each token's normalized position), and a 6-layer decoder of 300
queries with standard self-attention + deformable cross-attention
around per-query learned reference points; focal cls + L1*5 + GIoU*2
with Hungarian matching and deep supervision on every decoder layer.

The deformable attention core rides
:func:`iif_tpu.ops.deform.ms_deform_attention` (batched bilinear
gathers), replacing the mmcv ``MultiScaleDeformableAttention`` CUDA op
(SURVEY §2.4).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.detr import (
    bbox_cxcywh_to_xyxy,
    bbox_xyxy_to_cxcywh,
)
from iif_tpu.detection.losses import iou_loss, sigmoid_focal_loss
from iif_tpu.detection.sparse_rcnn import _focal_hungarian
from iif_tpu.models.resnet import ResNet
from iif_tpu.detection.single_stage import (
    SSTestCfg,
    SSTrainCfg,
    _DEPTH_LAYERS,
    _SingleStageBase,
    bias_init_with_prob,
)

DD_STRIDES = (8, 16, 32, 64)
NUM_HEADS = 8
NUM_POINTS = 4
EMBED = 256


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def sine_pos_embed(coords: jnp.ndarray, num_feats: int = 128,
                   temperature: int = 10000) -> jnp.ndarray:
    """SinePositionalEncoding (normalize=True) on normalized (x, y) in
    [0, 1]: (..., 2) -> (..., 2*num_feats)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    xy = coords * scale
    pos = xy[..., :, None] / dim_t                     # (..., 2, F)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1).reshape(pos.shape[:-1] + (num_feats,))
    # order (y, x) to match the reference's cat([pos_y, pos_x])
    return jnp.concatenate([pos[..., 1, :], pos[..., 0, :]], axis=-1)


class MSDeformAttn(nn.Module):
    """mmcv ``MultiScaleDeformableAttention``: per-head learned sampling
    offsets and softmax weights over (levels x points) around the
    reference point; grid-direction bias init on the offsets."""
    num_levels: int = 4
    num_heads: int = NUM_HEADS
    num_points: int = NUM_POINTS
    embed_dims: int = EMBED

    @nn.compact
    def __call__(self,
                 query: jnp.ndarray,          # (B, Q, C) incl. pos
                 value: jnp.ndarray,          # (B, N, C) flattened levels
                 shapes: Sequence[Tuple[int, int]],
                 ref_points: jnp.ndarray,     # (B, Q, L, 2) normalized
                 ) -> jnp.ndarray:
        from iif_tpu.ops.deform import ms_deform_attention

        b, q, c = query.shape
        h, L, P = self.num_heads, self.num_levels, self.num_points

        def offset_bias_init(key, shape=None, dtype=jnp.float32):
            thetas = np.arange(h) * (2.0 * np.pi / h)
            grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
            grid = grid / np.abs(grid).max(-1, keepdims=True)
            grid = np.tile(grid[:, None, None, :], (1, L, P, 1))
            grid = grid * (np.arange(P) + 1)[None, None, :, None]
            return jnp.asarray(grid.reshape(-1), jnp.float32)

        off = nn.Dense(h * L * P * 2,
                       kernel_init=nn.initializers.zeros,
                       bias_init=offset_bias_init,
                       name="sampling_offsets")(query)
        wts = nn.Dense(h * L * P, kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       name="attention_weights")(query)
        wts = jax.nn.softmax(wts.reshape(b, q, h, L * P), -1) \
            .reshape(b, q, h, L, P)
        v = nn.Dense(self.embed_dims, name="value_proj")(value)
        off = off.reshape(b, q, h, L, P, 2)
        norm = jnp.asarray([[w_, h_] for (h_, w_) in shapes],
                           jnp.float32)                 # (L, 2) (w, h)
        locs = ref_points[:, :, None, :, None, :] \
            + off / norm[None, None, None, :, None, :]
        # split flattened value back into per-level maps
        vals, start = [], 0
        for (hh, ww) in shapes:
            vals.append(v[:, start:start + hh * ww].reshape(b, hh, ww, -1))
            start += hh * ww
        out = ms_deform_attention(vals, locs, wts, h)
        return nn.Dense(self.embed_dims, name="output_proj")(out)


class _FFN(nn.Module):
    channels: int = 1024
    embed: int = EMBED

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.Dense(self.channels, name="fc1")(x)
        h = nn.Dense(self.embed, name="fc2")(nn.relu(h))
        return x + h


class DeformableDETR(_SingleStageBase):
    """``type='DeformableDETR'``."""
    num_query: int = 300
    num_enc_layers: int = 6
    num_dec_layers: int = 6

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        # ChannelMapper: 1x1 conv + GN32 on C3..C5, extra 3x3 s2 on C5
        self.lateral = [nn.Conv(EMBED, (1, 1), use_bias=False,
                                name=f"mapper_{i}") for i in range(3)]
        self.lateral_gn = [nn.GroupNorm(num_groups=32,
                                        name=f"mapper_gn_{i}")
                           for i in range(3)]
        self.extra_conv = nn.Conv(EMBED, (3, 3), strides=(2, 2),
                                  padding=1, use_bias=False,
                                  name="mapper_extra")
        self.extra_gn = nn.GroupNorm(num_groups=32, name="mapper_extra_gn")

        self.level_embed = self.param("level_embed",
                                      nn.initializers.normal(1.0),
                                      (4, EMBED))
        self.enc_attn = [MSDeformAttn(name=f"enc_attn_{i}")
                         for i in range(self.num_enc_layers)]
        self.enc_norm1 = [nn.LayerNorm(name=f"enc_n1_{i}")
                          for i in range(self.num_enc_layers)]
        self.enc_ffn = [_FFN(name=f"enc_ffn_{i}")
                        for i in range(self.num_enc_layers)]
        self.enc_norm2 = [nn.LayerNorm(name=f"enc_n2_{i}")
                          for i in range(self.num_enc_layers)]

        self.query_embed = self.param("query_embed",
                                      nn.initializers.normal(1.0),
                                      (self.num_query, 2 * EMBED))
        self.ref_linear = nn.Dense(2, name="reference_points")
        self.dec_self = [nn.SelfAttention(num_heads=NUM_HEADS,
                                          qkv_features=EMBED,
                                          name=f"dec_self_{i}")
                         for i in range(self.num_dec_layers)]
        self.dec_n1 = [nn.LayerNorm(name=f"dec_n1_{i}")
                       for i in range(self.num_dec_layers)]
        self.dec_cross = [MSDeformAttn(name=f"dec_cross_{i}")
                          for i in range(self.num_dec_layers)]
        self.dec_n2 = [nn.LayerNorm(name=f"dec_n2_{i}")
                       for i in range(self.num_dec_layers)]
        self.dec_ffn = [_FFN(name=f"dec_ffn_{i}")
                        for i in range(self.num_dec_layers)]
        self.dec_n3 = [nn.LayerNorm(name=f"dec_n3_{i}")
                       for i in range(self.num_dec_layers)]
        # shared branches (with_box_refine=False)
        self.fc_cls = nn.Dense(
            self.num_classes,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="fc_cls")
        self.reg_fc1 = nn.Dense(EMBED, name="reg_fc1")
        self.reg_fc2 = nn.Dense(EMBED, name="reg_fc2")
        self.reg_out = nn.Dense(4, name="reg_out")

    def _reg_branch(self, x):
        return self.reg_out(nn.relu(self.reg_fc2(
            nn.relu(self.reg_fc1(x)))))

    def forward_all(self, images: jnp.ndarray, train: bool = False):
        """Returns (all_cls (Lyr, B, Q, C), all_boxes (Lyr, B, Q, 4)
        normalized cxcywh)."""
        from iif_tpu.detection.detector import normalize_if_uint8

        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        c3, c4, c5 = feats[1], feats[2], feats[3]
        lvls = []
        for i, f in enumerate((c3, c4, c5)):
            lvls.append(self.lateral_gn[i](self.lateral[i](f)))
        lvls.append(self.extra_gn(self.extra_conv(c5)))
        b = images.shape[0]
        shapes = [tuple(f.shape[1:3]) for f in lvls]

        # flatten + positional and level embeddings
        toks, poss = [], []
        for lvl, f in enumerate(lvls):
            hh, ww = shapes[lvl]
            yy, xx = jnp.meshgrid(
                (jnp.arange(hh, dtype=jnp.float32) + 0.5) / hh,
                (jnp.arange(ww, dtype=jnp.float32) + 0.5) / ww,
                indexing="ij")
            pos = sine_pos_embed(
                jnp.stack([xx.ravel(), yy.ravel()], -1))   # (HW, 256)
            toks.append(f.reshape(b, -1, EMBED))
            poss.append(pos[None] + self.level_embed[lvl][None, None])
        memory = jnp.concatenate(toks, axis=1)             # (B, N, C)
        pos_all = jnp.concatenate(
            [jnp.broadcast_to(p, (b,) + p.shape[1:]) for p in poss],
            axis=1)

        # encoder reference points: each token's normalized center,
        # broadcast per level (valid_ratios == 1: fixed full canvases)
        refs = []
        for (hh, ww) in shapes:
            yy, xx = jnp.meshgrid(
                (jnp.arange(hh, dtype=jnp.float32) + 0.5) / hh,
                (jnp.arange(ww, dtype=jnp.float32) + 0.5) / ww,
                indexing="ij")
            refs.append(jnp.stack([xx.ravel(), yy.ravel()], -1))
        enc_ref = jnp.concatenate(refs, axis=0)            # (N, 2)
        enc_ref = jnp.broadcast_to(
            enc_ref[None, :, None, :], (b, enc_ref.shape[0], 4, 2))

        x = memory
        for i in range(self.num_enc_layers):
            attn = self.enc_attn[i](x + pos_all, x, shapes, enc_ref)
            x = self.enc_norm1[i](x + attn)
            x = self.enc_norm2[i](self.enc_ffn[i](x))
        memory = x

        # decoder
        qe = self.query_embed
        query_pos, query = qe[:, :EMBED], qe[:, EMBED:]
        query_pos = jnp.broadcast_to(query_pos[None],
                                     (b,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (b,) + query.shape)
        ref = jax.nn.sigmoid(self.ref_linear(query_pos))   # (B, Q, 2)
        ref_l = jnp.broadcast_to(ref[:, :, None, :],
                                 ref.shape[:2] + (4, 2))

        all_cls, all_boxes = [], []
        x = query
        for i in range(self.num_dec_layers):
            sa = self.dec_self[i](x + query_pos)
            x = self.dec_n1[i](x + sa)
            ca = self.dec_cross[i](x + query_pos, memory, shapes, ref_l)
            x = self.dec_n2[i](x + ca)
            x = self.dec_n3[i](self.dec_ffn[i](x))
            cls = self.fc_cls(x)
            tmp = self._reg_branch(x)
            xy = jax.nn.sigmoid(tmp[..., :2] + inverse_sigmoid(ref))
            wh = jax.nn.sigmoid(tmp[..., 2:])
            all_cls.append(cls)
            all_boxes.append(jnp.concatenate([xy, wh], -1))
        return jnp.stack(all_cls), jnp.stack(all_boxes)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        return self.forward_all(images, train)


def deformable_detr_loss(
    model: DeformableDETR,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``deformable_detr_head.py`` loss: per-decoder-layer Hungarian
    (focal 2 / L1 5 / GIoU 2) deep supervision; cls avg = num_pos."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    (all_cls, all_boxes), mutated = model.apply(
        variables, images, True, method=DeformableDETR.forward_all,
        mutable=["batch_stats"])
    c = model.num_classes
    img_hw = jnp.asarray([img_h, img_w], jnp.float32)
    factor = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)

    def _layer(cls_l, box_l):
        def _one(sc, bx_norm, gtb, gtl, gtv):
            bx = bbox_cxcywh_to_xyxy(bx_norm) * factor
            assigned = _focal_hungarian(
                jax.lax.stop_gradient(sc), jax.lax.stop_gradient(bx),
                gtb, gtl, gtv, img_hw)
            is_pos = assigned > 0
            gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
            labels = jnp.where(is_pos, gtl[gt_idx], c)
            l_cls = sigmoid_focal_loss(sc, labels, c, 2.0,
                                       0.25).sum() * 2.0
            tgt = gtb[gt_idx]
            tgt_norm = bbox_xyxy_to_cxcywh(tgt / factor)
            l_l1 = (jnp.abs(bx_norm - tgt_norm).sum(-1)
                    * is_pos).sum() * 5.0
            l_iou = (iou_loss(bx, tgt, "giou") * is_pos).sum() * 2.0
            return l_cls, l_l1, l_iou, is_pos.sum()

        lc, ll, li, npos = jax.vmap(_one)(
            cls_l.astype(jnp.float32), box_l.astype(jnp.float32),
            batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
        n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
        return lc.sum() / n, ll.sum() / n, li.sum() / n

    losses: Dict[str, jnp.ndarray] = {}
    n_layers = all_cls.shape[0]
    for i in range(n_layers):
        lc, ll, li = _layer(all_cls[i], all_boxes[i])
        prefix = "" if i == n_layers - 1 else f"d{i}."
        losses[f"{prefix}loss_cls"] = lc
        losses[f"{prefix}loss_bbox"] = ll
        losses[f"{prefix}loss_iou"] = li
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def deformable_detr_simple_test(
    model: DeformableDETR,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """``deformable_detr_head.py`` get_bboxes: rank last-layer sigmoid
    scores over (Q x C), no NMS."""
    b, img_h, img_w, _ = images.shape
    all_cls, all_boxes = model.apply(
        variables, images, False, method=DeformableDETR.forward_all)
    c = model.num_classes
    factor = jnp.asarray([img_w, img_h, img_w, img_h], jnp.float32)
    scores = jax.nn.sigmoid(all_cls[-1].astype(jnp.float32))
    boxes = bbox_cxcywh_to_xyxy(all_boxes[-1]) * factor
    k = min(cfg.max_per_img, scores.shape[1] * c)

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
