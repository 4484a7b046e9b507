"""CornerNet, static-shape.

Rebuild of the reference CornerNet family
(``mmdet/models/detectors/cornernet.py``, head
``mmdet/models/dense_heads/corner_head.py``, corner pooling — the
``mmcv.ops.CornerPool`` CUDA op — and config
``configs/cornernet/cornernet_hourglass104_mstest_8x6_210e_coco.py``):
a 2-stack HourglassNet; each stack gets top-left and bottom-right
corner branches built on BiCornerPool (directional max pooling), each
predicting a C-class corner heatmap (gaussian-focal), a 1-d associative
EMBEDDING (pull/push loss pairing the two corners of an object), and a
2-d sub-pixel offset (smooth-L1); decoding top-k corners per map and
pairing them by embedding distance.

TPU-first: corner pooling is an XLA ``lax.cummax`` along the flipped
axis (the CUDA op's exact semantics, one fused scan); corner pairing is
a (K, K) outer comparison instead of the reference's python filtering.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.centernet import (
    gaussian_focal_loss,
    gaussian_radius,
)
from iif_tpu.detection.single_stage import (
    SSTestCfg,
    SSTrainCfg,
    _SingleStageBase,
    bias_init_with_prob,
    normal_init,
)
from iif_tpu.models.hourglass import HourglassNet


def corner_pool(x: jnp.ndarray, direction: str) -> jnp.ndarray:
    """mmcv ``CornerPool``: running max toward a border.
    'top': out[i] = max(x[i:]) along H; 'left': along W; 'bottom'/
    'right' the reverse scans."""
    if direction == "top":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 1), axis=1), 1)
    if direction == "bottom":
        return jax.lax.cummax(x, axis=1)
    if direction == "left":
        return jnp.flip(jax.lax.cummax(jnp.flip(x, 2), axis=2), 2)
    if direction == "right":
        return jax.lax.cummax(x, axis=2)
    raise ValueError(direction)


class BiCornerPool(nn.Module):
    """``corner_head.py`` BiCornerPool: two direction convs -> pooled
    sum -> conv+BN fused with a 1x1 skip, relu, 3x3 out conv."""
    directions: Tuple[str, str]
    channels: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype, name=name)

        d1 = nn.relu(bn("d1_bn")(nn.Conv(
            128, (3, 3), padding=1, use_bias=False,
            kernel_init=normal_init, dtype=self.dtype,
            name="d1_conv")(x)))
        d2 = nn.relu(bn("d2_bn")(nn.Conv(
            128, (3, 3), padding=1, use_bias=False,
            kernel_init=normal_init, dtype=self.dtype,
            name="d2_conv")(x)))
        pooled = corner_pool(d1, self.directions[0]) \
            + corner_pool(d2, self.directions[1])
        out = bn("p_bn")(nn.Conv(
            self.channels, (3, 3), padding=1, use_bias=False,
            kernel_init=normal_init, dtype=self.dtype,
            name="p_conv")(pooled))
        skip = bn("s_bn")(nn.Conv(
            self.channels, (1, 1), use_bias=False,
            kernel_init=normal_init, dtype=self.dtype,
            name="s_conv")(x))
        out = nn.relu(out + skip)
        return nn.relu(bn("out_bn")(nn.Conv(
            self.channels, (3, 3), padding=1, use_bias=False,
            kernel_init=normal_init, dtype=self.dtype,
            name="out_conv")(out)))


class CornerBranch(nn.Module):
    """One corner's heads: heatmap (C, bias -2.19), embedding (1),
    offset (2), each conv3x3+relu then conv1x1."""
    num_classes: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        def head(out_ch, name, bias=None):
            h = nn.relu(nn.Conv(256, (3, 3), padding=1,
                                kernel_init=normal_init,
                                dtype=self.dtype,
                                name=f"{name}_feat")(x))
            kw = {}
            if bias is not None:
                kw["bias_init"] = nn.initializers.constant(bias)
            return nn.Conv(out_ch, (1, 1), kernel_init=normal_init,
                           name=f"{name}_out", **kw)(h)

        hm = head(self.num_classes, "heat",
                  bias=bias_init_with_prob(0.1))
        emb = head(1, "emb")
        off = head(2, "off")
        return hm, emb, off


class CornerNet(_SingleStageBase):
    num_stacks: int = 2

    def setup(self):
        self.backbone = HourglassNet(num_stacks=self.num_stacks,
                                     dtype=self.compute_dtype,
                                     name="backbone")
        self.tl_pools = [BiCornerPool(("top", "left"),
                                      dtype=self.compute_dtype,
                                      name=f"tl_pool_{i}")
                         for i in range(self.num_stacks)]
        self.br_pools = [BiCornerPool(("bottom", "right"),
                                      dtype=self.compute_dtype,
                                      name=f"br_pool_{i}")
                         for i in range(self.num_stacks)]
        self.tl_heads = [CornerBranch(self.num_classes,
                                      dtype=self.compute_dtype,
                                      name=f"tl_head_{i}")
                         for i in range(self.num_stacks)]
        self.br_heads = [CornerBranch(self.num_classes,
                                      dtype=self.compute_dtype,
                                      name=f"br_head_{i}")
                         for i in range(self.num_stacks)]

    def forward_all(self, images, train: bool = False):
        from iif_tpu.detection.detector import normalize_if_uint8

        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        outs = []
        for i, f in enumerate(feats):
            tl = self.tl_heads[i](self.tl_pools[i](f, train=train))
            br = self.br_heads[i](self.br_pools[i](f, train=train))
            outs.append((tl, br))
        return outs

    def __call__(self, images, train: bool = False):
        return self.forward_all(images, train)


def corner_targets(gt_boxes, gt_labels, gt_valid, num_classes,
                   feat_hw, img_hw):
    """``corner_head.py get_targets``: per-corner gaussian heatmaps
    (radius from min_overlap=0.3, halved per the reference's
    gaussian_radius((h/2, w/2))), integer-corner offsets, and the gt ->
    corner-pixel index maps for the embedding loss."""
    fh, fw = feat_hw
    wr = fw / img_hw[1]
    hr = fh / img_hw[0]
    tlx, tly = gt_boxes[:, 0] * wr, gt_boxes[:, 1] * hr
    brx, bry = gt_boxes[:, 2] * wr, gt_boxes[:, 3] * hr
    bw = (gt_boxes[:, 2] - gt_boxes[:, 0]) * wr
    bh = (gt_boxes[:, 3] - gt_boxes[:, 1]) * hr
    radius = jnp.maximum(jnp.floor(
        gaussian_radius(bh / 2.0, bw / 2.0)).astype(jnp.int32), 0)

    def _heat(cx, cy):
        cxi = jnp.clip(cx.astype(jnp.int32), 0, fw - 1)
        cyi = jnp.clip(cy.astype(jnp.int32), 0, fh - 1)
        xs = jnp.arange(fw)[None, None, :]
        ys = jnp.arange(fh)[None, :, None]
        dx = xs - cxi[:, None, None]
        dy = ys - cyi[:, None, None]
        sigma = (2 * radius + 1).astype(jnp.float32) / 6.0
        g = jnp.exp(-(dx ** 2 + dy ** 2)
                    / (2.0 * sigma[:, None, None] ** 2))
        inside = ((jnp.abs(dx) <= radius[:, None, None])
                  & (jnp.abs(dy) <= radius[:, None, None])
                  & gt_valid[:, None, None])
        g = jnp.where(inside & (g >= 1.19e-7), g, 0.0)
        hm = jnp.zeros((num_classes, fh, fw))
        hm = hm.at[jnp.clip(gt_labels, 0, num_classes - 1)].max(g)
        # offsets + pixel indices at the int corner
        off = jnp.stack([cx - cxi, cy - cyi], -1)          # (G, 2)
        pix = cyi * fw + cxi                               # (G,)
        return hm, off, pix

    tl_hm, tl_off, tl_pix = _heat(tlx, tly)
    br_hm, br_off, br_pix = _heat(brx, bry)
    return tl_hm, br_hm, tl_off, br_off, tl_pix, br_pix


def cornernet_loss(
    model: CornerNet,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """``corner_head.py loss``: per-stack gaussian focal heatmaps,
    associative-embedding pull/push (x0.1, x0.1 averaged over stacks
    inside), smooth-L1 corner offsets on gt corners."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    outs, mutated = model.apply(
        variables, images, True, method=CornerNet.forward_all,
        mutable=["batch_stats"])
    c = model.num_classes
    fh, fw = outs[0][0][0].shape[1:3]
    g = batch["gt_boxes"].shape[1]

    tgt = jax.vmap(lambda gtb, gtl, gtv: corner_targets(
        gtb, gtl, gtv, c, (fh, fw), (img_h, img_w)))(
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    tl_hm_t, br_hm_t, tl_off_t, br_off_t, tl_pix, br_pix = tgt
    tl_hm_t = tl_hm_t.transpose(0, 2, 3, 1)
    br_hm_t = br_hm_t.transpose(0, 2, 3, 1)
    gtv = batch["gt_valid"].astype(jnp.float32)

    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for s, ((tl_hm, tl_emb, tl_off), (br_hm, br_emb, br_off)) \
            in enumerate(outs):
        avg_tl = jnp.maximum((tl_hm_t == 1.0).sum(), 1.0)
        avg_br = jnp.maximum((br_hm_t == 1.0).sum(), 1.0)
        l_det = (gaussian_focal_loss(
            jax.nn.sigmoid(tl_hm.astype(jnp.float32)),
            tl_hm_t).sum() / avg_tl
            + gaussian_focal_loss(
                jax.nn.sigmoid(br_hm.astype(jnp.float32)),
                br_hm_t).sum() / avg_br) / 2.0

        # embeddings of each gt's two corners (gathered at int pixels)
        tl_e = jnp.take_along_axis(
            tl_emb.reshape(b, fh * fw), tl_pix, axis=1)    # (B, G)
        br_e = jnp.take_along_axis(
            br_emb.reshape(b, fh * fw), br_pix, axis=1)
        mean = (tl_e + br_e) / 2.0
        pull = (((tl_e - mean) ** 2 + (br_e - mean) ** 2)
                * gtv).sum() / jnp.maximum(gtv.sum(), 1.0)
        # push: margin 1 between different objects' means
        diff = jnp.abs(mean[:, :, None] - mean[:, None, :])
        pairs = (gtv[:, :, None] * gtv[:, None, :]
                 * (1 - jnp.eye(g)[None])).astype(jnp.float32)
        n_obj = gtv.sum(-1)
        denom = jnp.maximum((n_obj * (n_obj - 1)).sum(), 1.0)
        push = (jnp.maximum(1.0 - diff, 0.0) * pairs).sum() / denom

        # offsets: smooth-L1 at the int corner pixels of valid gts
        tl_o = jnp.take_along_axis(
            tl_off.reshape(b, fh * fw, 2).astype(jnp.float32),
            tl_pix[..., None], axis=1)
        br_o = jnp.take_along_axis(
            br_off.reshape(b, fh * fw, 2).astype(jnp.float32),
            br_pix[..., None], axis=1)

        def _sl1(p, t):
            d = jnp.abs(p - t)
            return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)

        l_off = ((_sl1(tl_o, tl_off_t).sum(-1)
                  + _sl1(br_o, br_off_t).sum(-1))
                 * gtv).sum() / jnp.maximum(2 * gtv.sum(), 1.0)

        losses[f"s{s}.loss_heatmap"] = l_det
        losses[f"s{s}.loss_pull"] = 0.1 * pull
        losses[f"s{s}.loss_push"] = 0.1 * push
        losses[f"s{s}.loss_offset"] = l_off
    total = sum(losses.values()) / model.num_stacks
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def cornernet_simple_test(
    model: CornerNet,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
    k_corners: int = 100,
    distance_threshold: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """``corner_head.py decode_heatmap``: 3x3-maxpool NMS on each
    heatmap, top-k corners, (K, K) pairing filtered by class match,
    geometry (br >= tl) and embedding distance."""
    b, img_h, img_w, _ = images.shape
    outs = model.apply(variables, images, False,
                       method=CornerNet.forward_all)
    (tl_hm, tl_emb, tl_off), (br_hm, br_emb, br_off) = outs[-1]
    c = model.num_classes
    fh, fw = tl_hm.shape[1:3]
    stride_w = img_w / fw
    stride_h = img_h / fh

    def _corners(hm, emb, off):
        p = jax.nn.sigmoid(hm.astype(jnp.float32))
        pooled = nn.max_pool(p, (3, 3), strides=(1, 1), padding="SAME")
        p = jnp.where(p == pooled, p, 0.0)
        flat = p.reshape(b, fh * fw * c)
        top_s, top_i = jax.lax.top_k(flat, k_corners)
        cls = top_i % c
        pix = top_i // c
        ys = (pix // fw).astype(jnp.float32)
        xs = (pix % fw).astype(jnp.float32)
        o = jnp.take_along_axis(
            off.reshape(b, fh * fw, 2).astype(jnp.float32),
            pix[..., None], axis=1)
        e = jnp.take_along_axis(
            emb.reshape(b, fh * fw).astype(jnp.float32), pix, axis=1)
        return top_s, cls, xs + o[..., 0], ys + o[..., 1], e

    tls, tlc, tlx, tly, tle = _corners(tl_hm, tl_emb, tl_off)
    brs, brc, brx, bry, bre = _corners(br_hm, br_emb, br_off)

    def _pair(tls_, tlc_, tlx_, tly_, tle_, brs_, brc_, brx_, bry_, bre_):
        score = (tls_[:, None] + brs_[None, :]) / 2.0       # (K, K)
        ok = (tlc_[:, None] == brc_[None, :])
        ok &= (brx_[None, :] >= tlx_[:, None]) \
            & (bry_[None, :] >= tly_[:, None])
        ok &= jnp.abs(tle_[:, None] - bre_[None, :]) \
            <= distance_threshold
        score = jnp.where(ok, score, -1.0)
        kk = score.reshape(-1)
        top_s, top_i = jax.lax.top_k(kk, cfg.max_per_img)
        ti = top_i // k_corners
        bi = top_i % k_corners
        boxes = jnp.stack([tlx_[ti] * stride_w, tly_[ti] * stride_h,
                           brx_[bi] * stride_w, bry_[bi] * stride_h], -1)
        boxes = jnp.stack([
            jnp.clip(boxes[..., 0], 0, img_w),
            jnp.clip(boxes[..., 1], 0, img_h),
            jnp.clip(boxes[..., 2], 0, img_w),
            jnp.clip(boxes[..., 3], 0, img_h)], -1)
        return (boxes, top_s, tlc_[ti].astype(jnp.int32),
                (top_s > cfg.score_thr) & (top_s > 0))

    dets, scores, labels, valid = jax.vmap(_pair)(
        tls, tlc, tlx, tly, tle, brs, brc, brx, bry, bre)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": scores, "labels": labels,
            "valid": valid}
