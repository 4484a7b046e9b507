"""CentripetalNet (CVPR 2020), static-shape.

Rebuild of the reference ``CentripetalHead``
(``mmdet/models/dense_heads/centripetal_head.py:12-430``, config
``configs/centripetalnet/centripetalnet_hourglass104_mstest_16x6_210e_coco.py``):
CornerNet's hourglass + corner-pool body, but the associative embedding
is replaced by two shift fields per corner —

- *guiding shift* (2ch, from the pooled feature): corner -> box center,
  also driving a deform-conv feature adaption;
- *centripetal shift* (2ch, from the adapted feature): log-scaled
  corner -> center used at decode time to pair corners whose predicted
  centers agree.

Decode keeps the (K, K) outer-pairing of the CornerNet rebuild; a pair
survives when both shifted centers land inside the candidate box's
central region and the center-box/central-region area ratio is under
``distance_threshold`` (``corner_head.py decode_heatmap``
centripetal branch).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from iif_tpu.detection.centernet import gaussian_focal_loss
from iif_tpu.detection.cornernet import (
    BiCornerPool,
    CornerNet,
    corner_targets,
)
from iif_tpu.detection.single_stage import (
    SSTestCfg,
    SSTrainCfg,
    bias_init_with_prob,
    normal_init,
)
from iif_tpu.models.hourglass import HourglassNet


class CentripetalBranch(nn.Module):
    """One corner's heads (``centripetal_head.py:72-204``): heatmap,
    offset, guiding shift; a deform conv adapts the pooled feature with
    offsets predicted from the (detached) guiding shift; the
    centripetal shift reads the adapted feature."""
    num_classes: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        from iif_tpu.ops.deform import deform_conv2d

        def head(out_ch, name, bias=None):
            h = nn.relu(nn.Conv(256, (3, 3), padding=1,
                                kernel_init=normal_init,
                                dtype=self.dtype,
                                name=f"{name}_feat")(x if name != "ctp"
                                                     else adapted))
            kw = {}
            if bias is not None:
                kw["bias_init"] = nn.initializers.constant(bias)
            return nn.Conv(out_ch, (1, 1), kernel_init=normal_init,
                           name=f"{name}_out", **kw)(h)

        adapted = None
        hm = head(self.num_classes, "heat", bias=bias_init_with_prob(0.1))
        off = head(2, "off")
        guiding = head(2, "guiding")
        dcn_off = nn.Conv(18, (1, 1), use_bias=False,
                          kernel_init=normal_init, name="dcn_offset")(
            jax.lax.stop_gradient(guiding).astype(jnp.float32))
        w_ada = self.param("feat_adaption", normal_init,
                           (3, 3, x.shape[-1], x.shape[-1]))
        adapted = nn.relu(deform_conv2d(
            x, dcn_off.reshape(dcn_off.shape[:3] + (9, 2)),
            w_ada.astype(x.dtype)))
        ctp = head(2, "ctp")
        return hm, off, guiding, ctp


class CentripetalNet(CornerNet):
    """Hourglass body from CornerNet with centripetal branches."""

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
        self.tl_heads = [CentripetalBranch(self.num_classes,
                                           dtype=self.compute_dtype,
                                           name=f"tl_head_{i}")
                         for i in range(self.num_stacks)]
        self.br_heads = [CentripetalBranch(self.num_classes,
                                           dtype=self.compute_dtype,
                                           name=f"br_head_{i}")
                         for i in range(self.num_stacks)]


def _shift_targets(gt_boxes, gt_valid, feat_hw, img_hw):
    """Guiding / centripetal shift targets at the int corner pixels
    (``corner_head.py:465-491``). Returns per-gt (G, 2) arrays for tl/br
    guiding and log-centripetal shifts."""
    fh, fw = feat_hw
    wr = fw / img_hw[1]
    hr = fh / img_hw[0]
    tlx, tly = gt_boxes[:, 0] * wr, gt_boxes[:, 1] * hr
    brx, bry = gt_boxes[:, 2] * wr, gt_boxes[:, 3] * hr
    cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5 * wr
    cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5 * hr
    tlxi = jnp.clip(tlx.astype(jnp.int32), 0, fw - 1).astype(jnp.float32)
    tlyi = jnp.clip(tly.astype(jnp.int32), 0, fh - 1).astype(jnp.float32)
    brxi = jnp.clip(brx.astype(jnp.int32), 0, fw - 1).astype(jnp.float32)
    bryi = jnp.clip(bry.astype(jnp.int32), 0, fh - 1).astype(jnp.float32)
    tl_guide = jnp.stack([cx - tlxi, cy - tlyi], -1)
    br_guide = jnp.stack([brxi - cx, bryi - cy], -1)
    eps = 1e-4
    tl_ctp = jnp.log(jnp.maximum(
        jnp.stack([cx - tlx, cy - tly], -1), eps))
    br_ctp = jnp.log(jnp.maximum(
        jnp.stack([brx - cx, bry - cy], -1), eps))
    return tl_guide, br_guide, tl_ctp, br_ctp


def centripetal_loss(
    model: CentripetalNet,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Gaussian-focal heatmaps + corner offsets (as CornerNet) + guiding
    SmoothL1 x0.05 + centripetal SmoothL1 x1
    (``centripetal_head.py:282-363``)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    outs, mutated = model.apply(
        variables, images, True, method=CentripetalNet.forward_all,
        mutable=["batch_stats"])
    c = model.num_classes
    fh, fw = outs[0][0][0].shape[1:3]

    tgt = jax.vmap(lambda gtb, gtl, gtv: corner_targets(
        gtb, gtl, gtv, c, (fh, fw), (img_h, img_w)))(
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    tl_hm_t, br_hm_t, tl_off_t, br_off_t, tl_pix, br_pix = tgt
    tl_hm_t = tl_hm_t.transpose(0, 2, 3, 1)
    br_hm_t = br_hm_t.transpose(0, 2, 3, 1)
    sh = jax.vmap(lambda gtb, gtv: _shift_targets(
        gtb, gtv, (fh, fw), (img_h, img_w)))(
        batch["gt_boxes"], batch["gt_valid"])
    tl_guide_t, br_guide_t, tl_ctp_t, br_ctp_t = sh
    gtv = batch["gt_valid"].astype(jnp.float32)
    navg = jnp.maximum(gtv.sum(), 1.0)

    def _sl1(p, t):
        d = jnp.abs(p - t)
        return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)

    def _gather2(field, pix):
        return jnp.take_along_axis(
            field.reshape(b, fh * fw, 2).astype(jnp.float32),
            pix[..., None], axis=1)

    losses: Dict[str, jnp.ndarray] = {}
    for s, ((tl_hm, tl_off, tl_gd, tl_cp),
            (br_hm, br_off, br_gd, br_cp)) in enumerate(outs):
        avg_tl = jnp.maximum((tl_hm_t == 1.0).sum(), 1.0)
        avg_br = jnp.maximum((br_hm_t == 1.0).sum(), 1.0)
        l_det = (gaussian_focal_loss(
            jax.nn.sigmoid(tl_hm.astype(jnp.float32)),
            tl_hm_t).sum() / avg_tl
            + gaussian_focal_loss(
                jax.nn.sigmoid(br_hm.astype(jnp.float32)),
                br_hm_t).sum() / avg_br) / 2.0
        l_off = ((_sl1(_gather2(tl_off, tl_pix), tl_off_t).sum(-1)
                  + _sl1(_gather2(br_off, br_pix), br_off_t).sum(-1))
                 * gtv).sum() / jnp.maximum(2 * gtv.sum(), 1.0)
        l_guide = ((_sl1(_gather2(tl_gd, tl_pix), tl_guide_t).sum(-1)
                    + _sl1(_gather2(br_gd, br_pix), br_guide_t).sum(-1))
                   * gtv).sum() / (2.0 * navg) * 0.05
        l_ctp = ((_sl1(_gather2(tl_cp, tl_pix), tl_ctp_t).sum(-1)
                  + _sl1(_gather2(br_cp, br_pix), br_ctp_t).sum(-1))
                 * gtv).sum() / (2.0 * navg)
        losses[f"s{s}.loss_heatmap"] = l_det
        losses[f"s{s}.loss_offset"] = l_off
        losses[f"s{s}.loss_guiding"] = l_guide
        losses[f"s{s}.loss_centripetal"] = l_ctp
    total = sum(losses.values()) / model.num_stacks
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def centripetal_simple_test(
    model: CentripetalNet,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
    k_corners: int = 100,
    distance_threshold: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Corner pairing by centripetal centers
    (``corner_head.py decode_heatmap`` with_centripetal_shift)."""
    b, img_h, img_w, _ = images.shape
    outs = model.apply(variables, images, False,
                       method=CentripetalNet.forward_all)
    (tl_hm, tl_off, _, tl_cp), (br_hm, br_off, _, br_cp) = outs[-1]
    c = model.num_classes
    fh, fw = tl_hm.shape[1:3]
    stride_w = img_w / fw
    stride_h = img_h / fh

    def _corners(hm, off, ctp):
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
        cp = jnp.exp(jnp.take_along_axis(
            ctp.reshape(b, fh * fw, 2).astype(jnp.float32),
            pix[..., None], axis=1))
        return top_s, cls, xs + o[..., 0], ys + o[..., 1], cp

    tls, tlc, tlx, tly, tlcp = _corners(tl_hm, tl_off, tl_cp)
    brs, brc, brx, bry, brcp = _corners(br_hm, br_off, br_cp)

    def _pair(tls_, tlc_, tlx_, tly_, tlcp_, brs_, brc_, brx_, bry_,
              brcp_):
        x1 = tlx_[:, None] * stride_w
        y1 = tly_[:, None] * stride_h
        x2 = brx_[None, :] * stride_w
        y2 = bry_[None, :] * stride_h
        # predicted centers from the centripetal shifts (feature scale
        # -> image scale)
        ctx_tl = (tlx_[:, None] + tlcp_[:, None, 0]) * stride_w
        cty_tl = (tly_[:, None] + tlcp_[:, None, 1]) * stride_h
        ctx_br = (brx_[None, :] - brcp_[None, :, 0]) * stride_w
        cty_br = (bry_[None, :] - brcp_[None, :, 1]) * stride_h

        area = jnp.abs((x2 - x1) * (y2 - y1))
        mu = jnp.where(area > 3500.0, 1 / 2.1, 1 / 2.4)
        cx = (x1 + x2) / 2
        cy = (y1 + y2) / 2
        rx1 = cx - mu * (x2 - x1) / 2
        ry1 = cy - mu * (y2 - y1) / 2
        rx2 = cx + mu * (x2 - x1) / 2
        ry2 = cy + mu * (y2 - y1) / 2
        area_ct = jnp.abs((ctx_br - ctx_tl) * (cty_br - cty_tl))
        area_r = jnp.abs((rx2 - rx1) * (ry2 - ry1))
        dists = area_ct / jnp.maximum(area_r, 1e-12)

        ok = (tlc_[:, None] == brc_[None, :])
        ok &= (x2 >= x1) & (y2 >= y1)
        ok &= dists <= distance_threshold
        ok &= (ctx_tl > rx1) & (ctx_tl < rx2) \
            & (cty_tl > ry1) & (cty_tl < ry2)
        ok &= (ctx_br > rx1) & (ctx_br < rx2) \
            & (cty_br > ry1) & (cty_br < ry2)
        score = jnp.where(ok, (tls_[:, None] + brs_[None, :]) / 2.0, -1.0)
        kk = score.reshape(-1)
        top_s, top_i = jax.lax.top_k(kk, cfg.max_per_img)
        ti = top_i // k_corners
        bi = top_i % k_corners
        boxes = jnp.stack([
            jnp.clip(tlx_[ti] * stride_w, 0, img_w),
            jnp.clip(tly_[ti] * stride_h, 0, img_h),
            jnp.clip(brx_[bi] * stride_w, 0, img_w),
            jnp.clip(bry_[bi] * stride_h, 0, img_h)], -1)
        return (boxes, top_s, tlc_[ti].astype(jnp.int32),
                (top_s > cfg.score_thr) & (top_s > 0))

    dets, scores, labels, valid = jax.vmap(_pair)(
        tls, tlc, tlx, tly, tlcp, brs, brc, brx, bry, brcp)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": scores, "labels": labels,
            "valid": valid}
