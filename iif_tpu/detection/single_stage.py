"""Single-stage detectors: RetinaNet and FCOS, fully static-shape.

Rebuild of the reference's single-stage family
(``mmdet/models/detectors/single_stage.py`` + ``retinanet.py`` /
``fcos.py``, heads ``mmdet/models/dense_heads/retina_head.py`` /
``anchor_head.py`` / ``fcos_head.py``): backbone -> FPN(P3-P7) -> a
conv head shared across levels; RetinaNet trains sigmoid focal loss on
MaxIoU-assigned anchors (pos 0.5 / neg 0.4, no sampling), FCOS is
anchor-free with per-level regress ranges, IoU loss, and a centerness
branch.

TPU-first structure mirrors ``detector.py``: flax modules hold only the
parameterized layers; target assignment, losses, and decoding are pure
static-shape functions vmapped over the batch — one XLA program per
step, no per-image python loop, no dynamic shape. Anchors/points enter
as closed-over numpy constants.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.detector import normalize_if_uint8
from iif_tpu.detection.losses import (
    iou_loss,
    l1_loss,
    sigmoid_focal_loss,
    smooth_l1_loss,
)
from iif_tpu.detection.necks import FPN
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.anchors import AnchorGenerator
from iif_tpu.ops.assigner import max_iou_assign
from iif_tpu.ops.boxes import bbox2delta, delta2bbox
from iif_tpu.ops.nms import multiclass_nms

from iif_tpu.detection.detector import _DEPTH_LAYERS  # noqa: E402  (canonical table)

normal_init = nn.initializers.normal(stddev=0.01)


def bias_init_with_prob(prior: float) -> float:
    """mmcv ``bias_init_with_prob``: focal-loss cls bias so that initial
    foreground probability == ``prior`` (RetinaNet paper init)."""
    return float(-math.log((1.0 - prior) / prior))


# ----------------------------------------------------------------- configs
class SSTrainCfg(NamedTuple):
    """Single-stage train knobs (reference retinanet_r50_fpn.py train_cfg:
    MaxIoUAssigner pos 0.5 / neg 0.4 / min_pos_iou 0, no sampling;
    FocalLoss gamma 2 alpha 0.25; L1 bbox loss)."""
    gamma: float = 2.0
    alpha: float = 0.25
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    # FCOS only
    center_sampling: bool = False
    center_sample_radius: float = 1.5
    iou_loss_mode: str = "log"
    # 'focal' | 'ghm' (reference configs/ghm/retinanet_ghm_r50_fpn:
    # GHMC bins=30 m=0.75 + GHMR mu=0.02 bins=10 m=0.7 x10)
    loss_kind: str = "focal"
    ghm_bins: int = 30
    ghm_momentum: float = 0.75
    ghmr_mu: float = 0.02
    ghmr_bins: int = 10
    ghmr_momentum: float = 0.7
    ghmr_weight: float = 10.0
    # PISA single-stage (pisa_retinanet_head.py; configs/pisa: ISR-P
    # k=2/bias=0, CARL k=1/bias=0.2 sigmoid, SmoothL1(0.11) reg)
    isr: tuple = ()
    carl: tuple = ()


class SSTestCfg(NamedTuple):
    """Reference retinanet/fcos test_cfg: nms_pre=1000, score_thr=0.05,
    nms iou 0.5, max_per_img=100."""
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou: float = 0.5
    max_per_img: int = 100


SS_STRIDES = (8, 16, 32, 64, 128)


def ss_fpn_shapes(img_hw: Tuple[int, int],
                  strides: Sequence[int] = SS_STRIDES
                  ) -> List[Tuple[int, int]]:
    h, w = img_hw
    return [(-(-h // s), -(-w // s)) for s in strides]


def make_retina_anchor_generator() -> AnchorGenerator:
    """RetinaNet anchors (reference retinanet_r50_fpn.py anchor_generator:
    octave_base_scale=4, scales_per_octave=3, ratios [0.5,1,2],
    strides [8,16,32,64,128]) — octave scales 4*2^(i/3) expressed through
    the generic ``scales`` list."""
    scales = [4.0 * 2.0 ** (i / 3.0) for i in range(3)]
    return AnchorGenerator(strides=list(SS_STRIDES),
                           ratios=[0.5, 1.0, 2.0], scales=scales)


# ------------------------------------------------------------------- heads
class RetinaHead(nn.Module):
    """4x(conv3x3+relu) cls/reg towers shared across levels + A*C / A*4
    output convs (``retina_head.py``); cls output bias initialized to the
    0.01 prior."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init, dtype=self.dtype,
                             name=f"cls_conv_{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             kernel_init=normal_init, dtype=self.dtype,
                             name=f"reg_conv_{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=1,
            kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="retina_cls")
        retina_reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                             kernel_init=normal_init, name="retina_reg")
        cls_scores, bbox_preds = [], []
        for x in feats:
            c = r = x
            for conv in cls_convs:
                c = nn.relu(conv(c))
            for conv in reg_convs:
                r = nn.relu(conv(r))
            cls_scores.append(retina_cls(c))
            bbox_preds.append(retina_reg(r))
        return cls_scores, bbox_preds


class RetinaSepBNHead(nn.Module):
    """RetinaHead with separate BN (``retina_sepbn_head.py:10-112``, the
    NAS-FPN head): conv WEIGHTS are shared across FPN levels while each
    level owns its BN statistics; cls/reg output convs shared."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    num_levels: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        cls_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=False, kernel_init=normal_init,
                             dtype=self.dtype, name=f"cls_conv_{i}")
                     for i in range(self.stacked_convs)]
        reg_convs = [nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=False, kernel_init=normal_init,
                             dtype=self.dtype, name=f"reg_conv_{i}")
                     for i in range(self.stacked_convs)]
        retina_cls = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=1,
            kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="retina_cls")
        retina_reg = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                             kernel_init=normal_init, name="retina_reg")
        cls_scores, bbox_preds = [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for i in range(self.stacked_convs):
                c = nn.relu(nn.BatchNorm(
                    use_running_average=not train,
                    name=f"cls_bn_l{lvl}_{i}")(cls_convs[i](c)))
                r = nn.relu(nn.BatchNorm(
                    use_running_average=not train,
                    name=f"reg_bn_l{lvl}_{i}")(reg_convs[i](r)))
            cls_scores.append(retina_cls(c))
            bbox_preds.append(retina_reg(r))
        return cls_scores, bbox_preds


class FCOSHead(nn.Module):
    """4x(conv3x3+GN32+relu) towers + per-level learnable reg scales and a
    centerness branch (``fcos_head.py``; centerness on the cls tower,
    the paper/mmdet default ``centerness_on_reg=False``)."""
    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_levels: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]
                 ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray],
                            List[jnp.ndarray]]:
        def tower(prefix):
            return [(nn.Conv(self.feat_channels, (3, 3), padding=1,
                             use_bias=True, kernel_init=normal_init,
                             dtype=self.dtype, name=f"{prefix}_conv_{i}"),
                     nn.GroupNorm(num_groups=32, name=f"{prefix}_gn_{i}"))
                    for i in range(self.stacked_convs)]

        cls_tower = tower("cls")
        reg_tower = tower("reg")
        conv_cls = nn.Conv(
            self.num_classes, (3, 3), padding=1, kernel_init=normal_init,
            bias_init=nn.initializers.constant(bias_init_with_prob(0.01)),
            name="conv_cls")
        conv_reg = nn.Conv(4, (3, 3), padding=1, kernel_init=normal_init,
                           name="conv_reg")
        conv_centerness = nn.Conv(1, (3, 3), padding=1,
                                  kernel_init=normal_init,
                                  name="conv_centerness")
        scales = [self.param(f"scale_{i}", nn.initializers.ones, ())
                  for i in range(self.num_levels)]
        cls_scores, bbox_preds, centernesses = [], [], []
        for lvl, x in enumerate(feats):
            c = r = x
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            cls_scores.append(conv_cls(c))
            # f32 before exp: bf16 exp overflows at large offsets
            reg = conv_reg(r).astype(jnp.float32) * scales[lvl]
            bbox_preds.append(jnp.exp(reg))
            centernesses.append(conv_centerness(c))
        return cls_scores, bbox_preds, centernesses


# --------------------------------------------------------------- detectors
class _SingleStageBase(nn.Module):
    num_classes: int = 80
    depth: int = 50
    frozen_stages: int = 1
    norm_eval: bool = True
    backbone_remat: bool = False
    compute_dtype: object = None
    with_mask: bool = False      # uniform surface with the two-stage CLIs

    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        return self.neck(feats)

    def forward_head(self, fpn_feats):
        return self.head(fpn_feats)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.extract_feat(images, train=train)
        return self.head(feats)


class RetinaNet(_SingleStageBase):
    """RetinaNet R50-FPN (reference
    ``configs/_base_/models/retinanet_r50_fpn.py``: FPN start_level=1,
    extra P6/P7 convs on C5, 9 anchors/cell, focal loss).

    ``head_type='sepbn'`` + ``neck_type='nasfpn'`` reproduce the NAS-FPN
    recipe (``configs/nas_fpn/retinanet_r50_nasfpn_crop640_50e_coco.py``:
    NASFPN neck with RetinaSepBNHead)."""

    head_type: str = "retina"     # 'retina' | 'sepbn'
    neck_type: str = "fpn"        # 'fpn' | 'nasfpn'
    backbone_type: str = "resnet"  # any build_backbone key (configs/pvt:
    #                                'pvt-tiny' RetinaNet, etc.)

    def setup(self):
        from iif_tpu.detection.detector import build_backbone

        self.backbone = build_backbone(
            self.backbone_type, depth=self.depth,
            frozen_stages=self.frozen_stages, norm_eval=self.norm_eval,
            remat=self.backbone_remat, dtype=self.compute_dtype)
        if self.neck_type == "nasfpn":
            from iif_tpu.detection.necks import NASFPN

            self.neck = NASFPN(out_channels=256, num_outs=5,
                               start_level=1,
                               dtype=self.compute_dtype, name="neck")
        elif self.neck_type == "fpg":
            # reference configs/fpg/retinanet_r50_fpg_crop640_50e_coco.py
            # (C3-C5 + stride-2 conv extras -> P3-P7)
            from iif_tpu.detection.necks import FPG

            self.neck = FPG(out_channels=256, num_outs=5,
                            start_level=1, add_extra_convs=True,
                            dtype=self.compute_dtype, name="neck")
        else:
            self.neck = FPN(out_channels=256, num_outs=5, start_level=1,
                            add_extra_convs="on_input",
                            dtype=self.compute_dtype, name="neck")
        if self.head_type == "sepbn":
            self.head = RetinaSepBNHead(self.num_classes, num_anchors=9,
                                        dtype=self.compute_dtype,
                                        name="bbox_head")
        else:
            self.head = RetinaHead(self.num_classes, num_anchors=9,
                                   dtype=self.compute_dtype,
                                   name="bbox_head")

    def forward_head_train(self, fpn_feats):
        return self.head(fpn_feats, train=True)


class FCOS(_SingleStageBase):
    """FCOS R50-FPN (reference ``configs/fcos/fcos_r50_caffe_fpn_gn-head``:
    FPN start_level=1, extra convs on_output with relu, GN head,
    per-level regress ranges)."""

    def setup(self):
        layers, block = _DEPTH_LAYERS[self.depth]
        self.backbone = ResNet(layers=layers, block=block,
                               frozen_stages=self.frozen_stages,
                               norm_eval=self.norm_eval,
                               remat=self.backbone_remat,
                               dtype=self.compute_dtype, name="backbone")
        self.neck = FPN(out_channels=256, num_outs=5, start_level=1,
                        add_extra_convs="on_output",
                        relu_before_extra_convs=True,
                        dtype=self.compute_dtype, name="neck")
        self.head = FCOSHead(self.num_classes, dtype=self.compute_dtype,
                             name="bbox_head")


# ------------------------------------------------------------ retina train
def _flatten_cls_reg(cls_scores, bbox_preds, num_classes):
    """[(B,H,W,A*C)], [(B,H,W,A*4)] -> (B, A_tot, C), (B, A_tot, 4)."""
    b = cls_scores[0].shape[0]
    scores = jnp.concatenate(
        [s.reshape(b, -1, num_classes) for s in cls_scores], axis=1)
    deltas = jnp.concatenate(
        [d.reshape(b, -1, 4) for d in bbox_preds], axis=1)
    return scores, deltas


class GHMState(NamedTuple):
    """GHM momentum histograms (the reference's ``acc_sum`` registered
    buffers, ``ghm_loss.py:60,151``) as functional train state."""
    acc_c: jnp.ndarray   # (ghm_bins,)
    acc_r: jnp.ndarray   # (ghmr_bins,)


def ghm_state_init(cfg: SSTrainCfg) -> GHMState:
    return GHMState(jnp.zeros((cfg.ghm_bins,), jnp.float32),
                    jnp.zeros((cfg.ghmr_bins,), jnp.float32))


def retinanet_loss(
    model: RetinaNet,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused (no sampling); uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
    ghm_state: Optional[GHMState] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Focal + L1 anchor losses over ALL (valid) anchors, PseudoSampler
    semantics (``anchor_head.py`` loss with sampling=False: every
    non-ignored anchor contributes to cls; positives to reg; both
    normalized by the batch positive count)."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=RetinaNet.extract_feat,
        mutable=["batch_stats"])
    if getattr(model, "head_type", "retina") == "sepbn":
        # per-level head BN: merge its stat updates with the backbone's
        vars2 = dict(variables)
        vars2["batch_stats"] = mutated.get(
            "batch_stats", variables.get("batch_stats", {}))
        (cls_scores, bbox_preds), mutated = model.apply(
            vars2, feats, method=RetinaNet.forward_head_train,
            mutable=["batch_stats"])
    else:
        cls_scores, bbox_preds = model.apply(
            variables, feats, method=RetinaNet.forward_head)

    gen = make_retina_anchor_generator()
    shapes = ss_fpn_shapes((img_h, img_w))
    anchors = jnp.asarray(
        np.concatenate(gen.grid_anchors(shapes), axis=0))
    valid = jnp.asarray(
        np.concatenate(gen.valid_flags(shapes, (img_h, img_w)), axis=0))
    scores, deltas = _flatten_cls_reg(cls_scores, bbox_preds,
                                      model.num_classes)

    def _targets(gtb, gtl, gtv):
        assigned, _ = max_iou_assign(
            anchors, gtb, gtv, cfg.pos_iou_thr, cfg.neg_iou_thr,
            cfg.min_pos_iou)
        assigned = jnp.where(valid, assigned, -1)
        is_pos = assigned > 0
        use = assigned >= 0                       # pos + neg, not ignored
        gt_idx = jnp.clip(assigned - 1, 0, gtb.shape[0] - 1)
        # background = num_classes (all-zero one-hot under sigmoid focal)
        labels = jnp.where(is_pos, gtl[gt_idx], model.num_classes)
        tgt = bbox2delta(anchors, gtb[gt_idx])
        return labels, use, is_pos, tgt, gt_idx

    labels, use, is_pos, tgt, gt_idx = jax.vmap(_targets)(
        batch["gt_boxes"], batch["gt_labels"], batch["gt_valid"])
    aux: Dict[str, Any] = {"batch_stats": mutated.get("batch_stats", {})}

    if cfg.loss_kind == "ghm" and ghm_state is not None:
        # GHM-C/GHM-R retina (configs/ghm/retinanet_ghm_r50_fpn): the
        # gradient-density histograms replace focal + L1; the momentum
        # accumulators thread through train state. One histogram per
        # step over the whole batch (the reference updates per FPN
        # level; same statistics, fewer tiny host-visible updates).
        from iif_tpu.detection.losses_extra import ghm_c_loss, ghm_r_loss

        c = model.num_classes
        onehot = (jax.nn.one_hot(labels, c, dtype=jnp.float32)
                  * is_pos[..., None].astype(jnp.float32))
        lw_c = jnp.broadcast_to(
            use[..., None], onehot.shape).astype(jnp.float32)
        l_cls, acc_c = ghm_c_loss(
            scores.reshape(-1, c), onehot.reshape(-1, c),
            lw_c.reshape(-1, c), bins=cfg.ghm_bins,
            momentum=cfg.ghm_momentum, acc_sum=ghm_state.acc_c)
        lw_r = jnp.broadcast_to(
            is_pos[..., None], tgt.shape).astype(jnp.float32)
        l_bbox, acc_r = ghm_r_loss(
            deltas.reshape(-1, 4), tgt.reshape(-1, 4),
            lw_r.reshape(-1, 4), mu=cfg.ghmr_mu, bins=cfg.ghmr_bins,
            momentum=cfg.ghmr_momentum, acc_sum=ghm_state.acc_r,
            loss_weight=cfg.ghmr_weight)
        aux["dynamic_state"] = GHMState(acc_c, acc_r)
        losses = {"loss_cls": l_cls, "loss_bbox": l_bbox}
        return l_cls + l_bbox, losses, aux

    c = model.num_classes
    labels_f = labels.reshape(-1)
    scores_f = scores.reshape(-1, c)
    deltas_f = deltas.reshape(-1, 4)
    tgt_f = tgt.reshape(-1, 4)
    lw = use.astype(jnp.float32).reshape(-1)
    avg = jnp.maximum(is_pos.sum().astype(jnp.float32), 1.0)

    if cfg.isr:
        # PISA ISR-P over the flattened anchors of the whole batch
        # (pisa_retinanet_head.py:108-126)
        from iif_tpu.detection.losses_extra import isr_p
        from iif_tpu.ops.boxes import bbox_overlaps_aligned, delta2bbox

        icfg = dict(cfg.isr)
        g = batch["gt_boxes"].shape[1]
        anchors_f = jnp.tile(anchors, (b, 1))
        dec_pred = delta2bbox(anchors_f, jax.lax.stop_gradient(deltas_f))
        dec_tgt = delta2bbox(anchors_f, tgt_f)
        ious = bbox_overlaps_aligned(dec_pred, dec_tgt)
        gt_global = (gt_idx + jnp.arange(b)[:, None]
                     * g).reshape(-1)
        lw = isr_p(
            jax.lax.stop_gradient(scores_f), labels_f, lw, ious,
            gt_global,
            lambda s, l, reduction="none": sigmoid_focal_loss(
                s, l, c, cfg.gamma, cfg.alpha),
            c, k=icfg.get("k", 2.0), bias=icfg.get("bias", 0.0))

    per_cls = sigmoid_focal_loss(scores_f, labels_f, c, cfg.gamma,
                                 cfg.alpha)
    l_cls = (per_cls * lw).sum()
    if cfg.isr or cfg.carl:
        per_reg = smooth_l1_loss(deltas_f, tgt_f, beta=0.11).sum(-1)
    else:
        per_reg = l1_loss(deltas, tgt).sum(-1).reshape(-1)
    l_bbox = (per_reg * is_pos.astype(jnp.float32).reshape(-1)).sum()
    losses = {"loss_cls": l_cls / avg, "loss_bbox": l_bbox / avg}

    if cfg.carl:
        from iif_tpu.detection.losses_extra import carl_loss

        ccfg = dict(cfg.carl)
        losses["loss_carl"] = carl_loss(
            scores_f, labels_f, lw, deltas_f, tgt_f,
            lambda p_, t_: smooth_l1_loss(p_, t_, beta=0.11),
            c, k=ccfg.get("k", 1.0), bias=ccfg.get("bias", 0.2),
            avg_factor=avg, sigmoid=True)

    total = sum(losses.values())
    return total, losses, aux


def retinanet_simple_test(
    model: RetinaNet,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-level top-``nms_pre`` (ranked by max class score, the sigmoid
    ``get_bboxes`` convention) -> decode -> multiclass NMS; fixed-shape
    (B, K) output slates."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=RetinaNet.extract_feat)
    cls_scores, bbox_preds = model.apply(
        variables, feats, method=RetinaNet.forward_head)
    gen = make_retina_anchor_generator()
    anchors_np = gen.grid_anchors(ss_fpn_shapes((img_h, img_w)))

    lvl_boxes, lvl_scores = [], []
    for s, d, anc in zip(cls_scores, bbox_preds, anchors_np):
        c = model.num_classes
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        d = d.reshape(b, -1, 4).astype(jnp.float32)
        anc = jnp.asarray(anc)
        k = min(cfg.nms_pre, s.shape[1])
        top_i = jax.lax.top_k(s.max(-1), k)[1]
        sel_s = jnp.take_along_axis(s, top_i[..., None], axis=1)
        sel_d = jnp.take_along_axis(d, top_i[..., None], axis=1)
        sel_a = jnp.broadcast_to(anc[None], (b,) + anc.shape)
        sel_a = jnp.take_along_axis(sel_a, top_i[..., None], axis=1)
        lvl_boxes.append(delta2bbox(sel_a, sel_d,
                                    max_shape=(img_h, img_w)))
        lvl_scores.append(sel_s)

    boxes = jnp.concatenate(lvl_boxes, axis=1)      # (B, N, 4)
    scores = jnp.concatenate(lvl_scores, axis=1)    # (B, N, C)

    def _one(bx, sc):
        # sigmoid heads append a zero background column for multiclass_nms
        padded = jnp.concatenate(
            [sc, jnp.zeros((sc.shape[0], 1), sc.dtype)], axis=1)
        return multiclass_nms(bx, padded, cfg.score_thr, cfg.nms_iou,
                              cfg.max_per_img)

    dets, out_scores, labels, det_valid = jax.vmap(_one)(boxes, scores)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}


# -------------------------------------------------------------- FCOS train
FCOS_REGRESS_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512),
                       (512, 100000000))


def fcos_points(img_hw: Tuple[int, int],
                strides: Sequence[int] = SS_STRIDES
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All-level point centers (P, 2), their strides (P,), and per-point
    regress ranges (P, 2) (``fcos_head.py`` get_points: stride//2
    offset)."""
    pts, strs, rngs = [], [], []
    for (fh, fw), s, rng in zip(ss_fpn_shapes(img_hw, strides), strides,
                                FCOS_REGRESS_RANGES):
        xs = (np.arange(fw, dtype=np.float32) * s) + s // 2
        ys = (np.arange(fh, dtype=np.float32) * s) + s // 2
        xx, yy = np.meshgrid(xs, ys)
        pts.append(np.stack([xx.ravel(), yy.ravel()], axis=-1))
        strs.append(np.full(fh * fw, s, np.float32))
        rngs.append(np.tile(np.asarray(rng, np.float32), (fh * fw, 1)))
    return (np.concatenate(pts), np.concatenate(strs),
            np.concatenate(rngs))


def fcos_targets(points: jnp.ndarray,      # (P, 2)
                 regress_ranges: jnp.ndarray,  # (P, 2)
                 strides: jnp.ndarray,     # (P,)
                 gt_boxes: jnp.ndarray,    # (G, 4)
                 gt_labels: jnp.ndarray,   # (G,)
                 gt_valid: jnp.ndarray,    # (G,)
                 num_classes: int,
                 center_sampling: bool = False,
                 center_sample_radius: float = 1.5,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-point (labels (P,), ltrb targets (P, 4), centerness (P,)) —
    ``fcos_head.py`` ``_get_target_single``: a point is positive for the
    min-area gt containing it whose max regress distance falls in the
    level's range; background label = num_classes."""
    px, py = points[:, 0:1], points[:, 1:2]               # (P, 1)
    l = px - gt_boxes[None, :, 0]                         # (P, G)
    t = py - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - px
    b = gt_boxes[None, :, 3] - py
    ltrb = jnp.stack([l, t, r, b], axis=-1)               # (P, G, 4)
    if center_sampling:
        cx = (gt_boxes[:, 0] + gt_boxes[:, 2]) * 0.5
        cy = (gt_boxes[:, 1] + gt_boxes[:, 3]) * 0.5
        rad = strides[:, None] * center_sample_radius     # (P, 1)
        cb_x1 = jnp.maximum(cx[None] - rad, gt_boxes[None, :, 0])
        cb_y1 = jnp.maximum(cy[None] - rad, gt_boxes[None, :, 1])
        cb_x2 = jnp.minimum(cx[None] + rad, gt_boxes[None, :, 2])
        cb_y2 = jnp.minimum(cy[None] + rad, gt_boxes[None, :, 3])
        inside = ((px > cb_x1) & (px < cb_x2)
                  & (py > cb_y1) & (py < cb_y2))
    else:
        inside = ltrb.min(-1) > 0                         # (P, G)
    max_reg = ltrb.max(-1)                                # (P, G)
    in_range = ((max_reg >= regress_ranges[:, None, 0])
                & (max_reg <= regress_ranges[:, None, 1]))
    areas = ((gt_boxes[:, 2] - gt_boxes[:, 0])
             * (gt_boxes[:, 3] - gt_boxes[:, 1]))         # (G,)
    cand = inside & in_range & gt_valid[None, :]
    big = jnp.float32(1e18)
    masked_areas = jnp.where(cand, areas[None, :], big)   # (P, G)
    min_idx = masked_areas.argmin(-1)                     # (P,)
    is_pos = masked_areas.min(-1) < big
    labels = jnp.where(is_pos, gt_labels[min_idx], num_classes)
    tgt = jnp.take_along_axis(
        ltrb, min_idx[:, None, None], axis=1)[:, 0]       # (P, 4)
    lr = jnp.stack([tgt[:, 0], tgt[:, 2]], -1)
    tb = jnp.stack([tgt[:, 1], tgt[:, 3]], -1)
    ctr = jnp.sqrt(jnp.clip(
        (lr.min(-1) / jnp.maximum(lr.max(-1), 1e-6))
        * (tb.min(-1) / jnp.maximum(tb.max(-1), 1e-6)), 0.0))
    return labels, tgt, jnp.where(is_pos, ctr, 0.0)


def distance2bbox(points: jnp.ndarray, ltrb: jnp.ndarray,
                  max_shape: Optional[Tuple[int, int]] = None
                  ) -> jnp.ndarray:
    """(P, 2) centers + (P, 4) ltrb distances -> (P, 4) xyxy boxes
    (reference ``mmdet/core/bbox/transforms.py`` distance2bbox)."""
    x1 = points[..., 0] - ltrb[..., 0]
    y1 = points[..., 1] - ltrb[..., 1]
    x2 = points[..., 0] + ltrb[..., 2]
    y2 = points[..., 1] + ltrb[..., 3]
    if max_shape is not None:
        x1 = jnp.clip(x1, 0, max_shape[1])
        y1 = jnp.clip(y1, 0, max_shape[0])
        x2 = jnp.clip(x2, 0, max_shape[1])
        y2 = jnp.clip(y2, 0, max_shape[0])
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def fcos_loss(
    model: FCOS,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,                 # unused; uniform API
    cfg: SSTrainCfg = SSTrainCfg(),
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Focal cls (avg by num_pos) + centerness-weighted IoU bbox loss
    (avg by centerness sum) + BCE centerness (avg by num_pos) —
    ``fcos_head.py`` loss()."""
    images = batch["image"]
    b, img_h, img_w, _ = images.shape
    feats, mutated = model.apply(
        variables, images, True, method=FCOS.extract_feat,
        mutable=["batch_stats"])
    cls_scores, bbox_preds, centernesses = model.apply(
        variables, feats, method=FCOS.forward_head)

    pts_np, str_np, rng_np = fcos_points((img_h, img_w))
    points = jnp.asarray(pts_np)
    strides = jnp.asarray(str_np)
    ranges = jnp.asarray(rng_np)
    c = model.num_classes
    scores = jnp.concatenate(
        [s.reshape(b, -1, c) for s in cls_scores], axis=1)
    preds = jnp.concatenate(
        [p.reshape(b, -1, 4) for p in bbox_preds], axis=1)
    ctr_pred = jnp.concatenate(
        [x.reshape(b, -1) for x in centernesses], axis=1)

    def _one(score, pred, ctr, gtb, gtl, gtv):
        labels, ltrb_tgt, ctr_tgt = fcos_targets(
            points, ranges, strides, gtb, gtl, gtv, c,
            cfg.center_sampling, cfg.center_sample_radius)
        is_pos = labels < c
        l_cls = sigmoid_focal_loss(score, labels, c, cfg.gamma,
                                   cfg.alpha).sum()
        boxes_p = distance2bbox(points, pred)
        boxes_t = distance2bbox(points, ltrb_tgt)
        l_bbox = (iou_loss(boxes_p, boxes_t, cfg.iou_loss_mode)
                  * ctr_tgt * is_pos).sum()
        bce = (jnp.maximum(ctr, 0) - ctr * ctr_tgt
               + jnp.log1p(jnp.exp(-jnp.abs(ctr))))
        l_ctr = (bce * is_pos).sum()
        return l_cls, l_bbox, l_ctr, is_pos.sum(), (ctr_tgt * is_pos).sum()

    lc, lb, lctr, npos, ctr_sum = jax.vmap(_one)(
        scores.astype(jnp.float32), preds.astype(jnp.float32),
        ctr_pred.astype(jnp.float32), batch["gt_boxes"],
        batch["gt_labels"], batch["gt_valid"])
    n = jnp.maximum(npos.sum().astype(jnp.float32), 1.0)
    cs = jnp.maximum(ctr_sum.sum(), 1e-6)
    losses = {"loss_cls": lc.sum() / n, "loss_bbox": lb.sum() / cs,
              "loss_centerness": lctr.sum() / n}
    total = sum(losses.values())
    return total, losses, {"batch_stats": mutated.get("batch_stats", {})}


def fcos_simple_test(
    model: FCOS,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    cfg: SSTestCfg = SSTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-level top-``nms_pre`` ranked by max(score)*centerness, decode
    distances, centerness-scaled multiclass NMS (``fcos_head.py``
    ``_get_bboxes_single`` with score_factors)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method=FCOS.extract_feat)
    cls_scores, bbox_preds, centernesses = model.apply(
        variables, feats, method=FCOS.forward_head)
    c = model.num_classes

    lvl_boxes, lvl_scores = [], []
    for lvl, (s, p, ct) in enumerate(zip(cls_scores, bbox_preds,
                                         centernesses)):
        fh, fw = s.shape[1:3]
        stride = SS_STRIDES[lvl]
        xs = (jnp.arange(fw, dtype=jnp.float32) * stride) + stride // 2
        ys = (jnp.arange(fh, dtype=jnp.float32) * stride) + stride // 2
        xx, yy = jnp.meshgrid(xs, ys)
        pts = jnp.stack([xx.ravel(), yy.ravel()], axis=-1)
        s = jax.nn.sigmoid(s.reshape(b, -1, c).astype(jnp.float32))
        ct = jax.nn.sigmoid(ct.reshape(b, -1).astype(jnp.float32))
        p = p.reshape(b, -1, 4).astype(jnp.float32)
        k = min(cfg.nms_pre, s.shape[1])
        rank = (s * ct[..., None]).max(-1)
        top_i = jax.lax.top_k(rank, k)[1]
        sel_s = jnp.take_along_axis(s * ct[..., None],
                                    top_i[..., None], axis=1)
        sel_p = jnp.take_along_axis(p, top_i[..., None], axis=1)
        sel_pts = jnp.take_along_axis(
            jnp.broadcast_to(pts[None], (b,) + pts.shape),
            top_i[..., None], axis=1)
        lvl_boxes.append(distance2bbox(sel_pts, sel_p, (img_h, img_w)))
        lvl_scores.append(sel_s)

    boxes = jnp.concatenate(lvl_boxes, axis=1)
    scores = jnp.concatenate(lvl_scores, axis=1)

    def _one(bx, sc):
        padded = jnp.concatenate(
            [sc, jnp.zeros((sc.shape[0], 1), sc.dtype)], axis=1)
        return multiclass_nms(bx, padded, cfg.score_thr, cfg.nms_iou,
                              cfg.max_per_img)

    dets, out_scores, labels, det_valid = jax.vmap(_one)(boxes, scores)
    if scale_factor is not None:
        dets = dets / scale_factor[:, None, :]
    return {"boxes": dets, "scores": out_scores, "labels": labels,
            "valid": det_valid}


def single_stage_loss_fn(model):
    """Dispatch used by ``DetectionTrainer``."""
    from iif_tpu.detection.atss import ATSS, atss_loss
    from iif_tpu.detection.autoassign import AutoAssign, autoassign_loss
    from iif_tpu.detection.centernet import CenterNet, centernet_loss
    from iif_tpu.detection.cornernet import CornerNet, cornernet_loss
    from iif_tpu.detection.fovea import FoveaBox, fovea_loss
    from iif_tpu.detection.fsaf import FSAF, fsaf_loss
    from iif_tpu.detection.gfl import GFL, gfl_loss
    from iif_tpu.detection.paa import PAA, paa_loss
    from iif_tpu.detection.reppoints import RepPoints, reppoints_loss
    from iif_tpu.detection.deformable_detr import (
        DeformableDETR,
        deformable_detr_loss,
    )
    from iif_tpu.detection.sparse_rcnn import SparseRCNN, sparse_rcnn_loss
    from iif_tpu.detection.ssd import SSD, ssd_loss
    from iif_tpu.detection.vfnet import VFNet, vfnet_loss
    from iif_tpu.detection.yolact import YOLACT, yolact_loss
    from iif_tpu.detection.yolof import YOLOF, yolof_loss
    from iif_tpu.detection.yolov3 import YOLOV3, yolov3_loss
    from iif_tpu.detection.yolox import YOLOX, yolox_loss

    from iif_tpu.detection.centripetal import (
        CentripetalNet,
        centripetal_loss,
    )
    from iif_tpu.detection.free_anchor import FreeAnchor, free_anchor_loss
    from iif_tpu.detection.guided_anchor import GARetinaNet, ga_retina_loss

    if isinstance(model, CentripetalNet):
        return centripetal_loss
    if isinstance(model, GARetinaNet):
        return ga_retina_loss
    if isinstance(model, FreeAnchor):
        return free_anchor_loss
    if isinstance(model, YOLOF):
        return yolof_loss
    if isinstance(model, RepPoints):
        return reppoints_loss
    if isinstance(model, VFNet):
        return vfnet_loss
    if isinstance(model, SparseRCNN):
        return sparse_rcnn_loss
    if isinstance(model, DeformableDETR):
        return deformable_detr_loss
    if isinstance(model, YOLACT):
        return yolact_loss
    if isinstance(model, CornerNet):
        return cornernet_loss
    if isinstance(model, AutoAssign):
        return autoassign_loss
    if isinstance(model, PAA):
        return paa_loss
    if isinstance(model, GFL):
        return gfl_loss
    if isinstance(model, FSAF):
        return fsaf_loss
    if isinstance(model, FoveaBox):
        return fovea_loss
    if isinstance(model, ATSS):
        return atss_loss
    if isinstance(model, SSD):
        return ssd_loss
    if isinstance(model, YOLOX):
        return yolox_loss
    if isinstance(model, YOLOV3):
        return yolov3_loss
    if isinstance(model, CenterNet):
        return centernet_loss
    return fcos_loss if isinstance(model, FCOS) else retinanet_loss


def single_stage_simple_test(model, variables, images,
                             cfg: SSTestCfg = SSTestCfg(),
                             scale_factor=None):
    from iif_tpu.detection.atss import ATSS, atss_simple_test
    from iif_tpu.detection.autoassign import (
        AutoAssign,
        autoassign_simple_test,
    )
    from iif_tpu.detection.centernet import (
        CenterNet,
        centernet_simple_test,
    )
    from iif_tpu.detection.cornernet import (
        CornerNet,
        cornernet_simple_test,
    )
    from iif_tpu.detection.fovea import FoveaBox, fovea_simple_test
    from iif_tpu.detection.fsaf import FSAF, fsaf_simple_test
    from iif_tpu.detection.gfl import GFL, gfl_simple_test
    from iif_tpu.detection.paa import PAA, paa_simple_test
    from iif_tpu.detection.reppoints import RepPoints, reppoints_simple_test
    from iif_tpu.detection.deformable_detr import (
        DeformableDETR,
        deformable_detr_simple_test,
    )
    from iif_tpu.detection.sparse_rcnn import (
        SparseRCNN,
        sparse_rcnn_simple_test,
    )
    from iif_tpu.detection.ssd import SSD, ssd_simple_test
    from iif_tpu.detection.vfnet import VFNet, vfnet_simple_test
    from iif_tpu.detection.yolact import YOLACT, yolact_simple_test
    from iif_tpu.detection.yolof import YOLOF, yolof_simple_test
    from iif_tpu.detection.yolov3 import YOLOV3, yolov3_simple_test
    from iif_tpu.detection.yolox import YOLOX, yolox_simple_test

    from iif_tpu.detection.centripetal import (
        CentripetalNet,
        centripetal_simple_test,
    )
    from iif_tpu.detection.guided_anchor import (
        GARetinaNet,
        ga_retina_simple_test,
    )

    if isinstance(model, CentripetalNet):
        fn = centripetal_simple_test
    elif isinstance(model, GARetinaNet):
        fn = ga_retina_simple_test
    elif isinstance(model, YOLOF):
        fn = yolof_simple_test
    elif isinstance(model, RepPoints):
        fn = reppoints_simple_test
    elif isinstance(model, VFNet):
        fn = vfnet_simple_test
    elif isinstance(model, SparseRCNN):
        fn = sparse_rcnn_simple_test
    elif isinstance(model, DeformableDETR):
        fn = deformable_detr_simple_test
    elif isinstance(model, YOLACT):
        fn = yolact_simple_test
    elif isinstance(model, CornerNet):
        fn = cornernet_simple_test
    elif isinstance(model, AutoAssign):
        fn = autoassign_simple_test
    elif isinstance(model, PAA):
        fn = paa_simple_test
    elif isinstance(model, GFL):
        fn = gfl_simple_test
    elif isinstance(model, FSAF):
        fn = fsaf_simple_test
    elif isinstance(model, FoveaBox):
        fn = fovea_simple_test
    elif isinstance(model, ATSS):
        fn = atss_simple_test
    elif isinstance(model, SSD):
        fn = ssd_simple_test
    elif isinstance(model, YOLOX):
        fn = yolox_simple_test
    elif isinstance(model, YOLOV3):
        fn = yolov3_simple_test
    elif isinstance(model, CenterNet):
        fn = centernet_simple_test
    else:
        fn = (fcos_simple_test if isinstance(model, FCOS)
              else retinanet_simple_test)
    return fn(model, variables, images, cfg, scale_factor)
