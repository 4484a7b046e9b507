"""MaskRCNN two-stage detector, fully static-shape.

Rebuild of ``mmdet/models/detectors/two_stage.py`` / ``mask_rcnn.py`` +
``StandardRoIHead`` (``standard_roi_head.py``): backbone -> FPN -> RPN
(+proposals) -> RoIAlign -> bbox head (IIF) -> mask head.

TPU-first structure: the flax module only holds the parameterized layers;
all orchestration (anchor targets, proposal NMS, RoI sampling, losses)
lives in pure functions that jit into ONE XLA program per train step —
there is no per-image python loop, no dynamic shape, no host sync.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from iif_tpu.detection.bbox_head import (
    BBoxTargets,
    Shared2FCBBoxHead,
    bbox_head_get_bboxes,
    bbox_head_loss,
    bbox_targets,
)
from iif_tpu.detection.mask_head import (
    FCNMaskHead,
    mask_head_loss,
    mask_targets,
)
from iif_tpu.detection.necks import FPN
from iif_tpu.detection.roi_extractor import SingleRoIExtractor
from iif_tpu.detection.rpn import RPNHead, rpn_loss, rpn_proposals
from iif_tpu.models.resnet import ResNet
from iif_tpu.ops.anchors import AnchorGenerator

_DEPTH_LAYERS = {18: ((2, 2, 2, 2), "basic"), 34: ((3, 4, 6, 3), "basic"),
                 50: ((3, 4, 6, 3), "bottleneck"),
                 101: ((3, 4, 23, 3), "bottleneck"),
                 152: ((3, 8, 36, 3), "bottleneck")}

# ImageNet pixel stats (0-255 scale) for DEVICE-side normalization of
# uint8 canvases (DetectionPipeline(emit_uint8=True) ships raw pixels —
# 4x less host->device traffic, no per-sample float math on the host)
IMG_MEAN = (123.675, 116.28, 103.53)
IMG_STD = (58.395, 57.12, 57.375)


def normalize_if_uint8(images: jnp.ndarray) -> jnp.ndarray:
    """(x - mean) / std when the canvas arrives as raw uint8 pixels;
    identity for already-normalized float input."""
    if images.dtype != jnp.uint8:
        return images
    mean = jnp.asarray(IMG_MEAN, jnp.float32)
    std = jnp.asarray(IMG_STD, jnp.float32)
    return (images.astype(jnp.float32) - mean) / std


def unpack_mask_bits(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """Device-side inverse of ``np.packbits(masks, axis=-1)`` (big-endian
    bit order): (..., W/8) uint8 -> (..., width) uint8 in {0, 1}."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(packed.shape[:-1] + (-1,))[..., :width]


def resolve_gt_masks(batch: Dict[str, jnp.ndarray], mask_width: int
                     ) -> jnp.ndarray:
    """gt masks from either the dense 'gt_masks' key or the bit-packed
    'gt_masks_packed' key (unpacked on device)."""
    if "gt_masks" in batch:
        return batch["gt_masks"]
    return unpack_mask_bits(batch["gt_masks_packed"], mask_width)


class MaskRCNN(nn.Module):
    num_classes: int = 1203
    depth: int = 50
    # 'resnet' (the IIF configs), 'swin-t'/'swin-s'/'swin-b'
    # (reference configs/swin/mask_rcnn_swin-*; drop_path defaults to 0
    # here — enabling it needs a 'dropout' rng the two-stage loss does
    # not thread), 'res2net', 'regnetx-*', 'hrnet-w18/w32/w40'
    # (configs/hrnet — pairs with neck_type='hrfpn'), 'mobilenet_v2'
    backbone_type: str = "resnet"
    # 'fpn' | 'pafpn' (configs/pafpn) | 'nasfpn' (configs/nas_fpn) |
    # 'hrfpn' (HRNetV2p) | 'bfp' (Libra R-CNN: FPN + balanced refine)
    neck_type: str = "fpn"
    with_mask: bool = True
    # MaskScoringRCNN (reference mask_scoring_rcnn.py +
    # mask_scoring_roi_head.py): adds the MaskIoUHead and its MSE loss,
    # and at inference multiplies det scores by the predicted mask IoU
    with_mask_iou: bool = False
    # FastRCNN (reference fast_rcnn.py): no RPN — proposals arrive
    # precomputed via batch['proposals']/'proposals_valid'
    with_rpn: bool = True
    cls_predictor: str = "linear"     # 'linear' | 'normed' (cos-norm head)
    mask_predictor: str = "conv"      # 'conv' | 'normed'
    # NormedLinear/NormedConv2d temperatures: the reference FASA configs use
    # cls temp 8 with IIF but temp 20 without (fasa_r50_cos_norm_4x4_2x.py
    # cls_predictor_cfg tempearture=20); mask head is always 20
    cls_temperature: float = 8.0
    mask_temperature: float = 20.0
    frozen_stages: int = 1            # reference config: frozen_stages=1
    norm_eval: bool = True            # reference config: norm_eval=True
    backbone_remat: bool = False      # jax.checkpoint residual blocks
    compute_dtype: object = None      # e.g. jnp.bfloat16 for backbone/FPN/RPN
    iif_weights: tuple = ()           # for cls_predictor='iif_normed'
    cls_init: tuple = ("normal", 0.01)  # fc_cls weight init (IIF: constant)

    def setup(self):
        if self.backbone_type.startswith("swin"):
            from iif_tpu.models.swin import swin_b, swin_s, swin_t

            ctor = {"swin-t": swin_t, "swin-s": swin_s,
                    "swin-b": swin_b}[self.backbone_type]
            self.backbone = ctor(drop_path_rate=0.0,
                                 frozen_stages=self.frozen_stages,
                                 dtype=self.compute_dtype,
                                 name="backbone")
        elif self.backbone_type == "res2net":
            # reference configs/res2net/*_r2_101_fpn_*: Res2Net-101 26w4s
            from iif_tpu.models.res2net import Res2Net

            layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[self.depth]
            self.backbone = Res2Net(layers=layers,
                                    frozen_stages=self.frozen_stages,
                                    norm_eval=self.norm_eval,
                                    dtype=self.compute_dtype,
                                    name="backbone")
        elif self.backbone_type.startswith("regnetx"):
            # reference configs/regnet/mask_rcnn_regnetx-*_fpn_*
            from iif_tpu.models.regnet import RegNet

            self.backbone = RegNet(arch=self.backbone_type,
                                   frozen_stages=self.frozen_stages,
                                   norm_eval=self.norm_eval,
                                   dtype=self.compute_dtype,
                                   name="backbone")
        elif self.backbone_type.startswith("hrnet"):
            # reference configs/hrnet/*_hrnetv2p_w{18,32,40}_*
            from iif_tpu.models.hrnet import HRNet

            self.backbone = HRNet(width=int(self.backbone_type[7:]),
                                  norm_eval=self.norm_eval,
                                  dtype=self.compute_dtype,
                                  name="backbone")
        elif self.backbone_type == "mobilenet_v2":
            from iif_tpu.models.mobilenet_v2 import MobileNetV2

            self.backbone = MobileNetV2(norm_eval=self.norm_eval,
                                        dtype=self.compute_dtype,
                                        name="backbone")
        elif self.backbone_type.startswith("pvt"):
            # reference configs/pvt/retinanet_pvt-t_fpn_1x_coco.py etc.
            from iif_tpu.models.pvt import PVT

            self.backbone = PVT(arch=self.backbone_type.split("-")[1],
                                norm_eval=self.norm_eval,
                                dtype=self.compute_dtype,
                                name="backbone")
        elif self.backbone_type == "resnest":
            # reference configs/resnest/*-s50 family
            from iif_tpu.models.resnest import ResNeSt

            self.backbone = ResNeSt(depth=self.depth,
                                    frozen_stages=self.frozen_stages,
                                    norm_eval=self.norm_eval,
                                    dtype=self.compute_dtype,
                                    name="backbone")
        else:
            layers, block = _DEPTH_LAYERS[self.depth]
            self.backbone = ResNet(layers=layers, block=block,
                                   frozen_stages=self.frozen_stages,
                                   norm_eval=self.norm_eval,
                                   remat=self.backbone_remat,
                                   dtype=self.compute_dtype,
                                   name="backbone")
        if self.neck_type == "pafpn":
            from iif_tpu.detection.necks import PAFPN

            self.neck = PAFPN(out_channels=256, num_outs=5,
                              dtype=self.compute_dtype, name="neck")
        elif self.neck_type == "nasfpn":
            from iif_tpu.detection.necks import NASFPN

            self.neck = NASFPN(out_channels=256, num_outs=5,
                               dtype=self.compute_dtype, name="neck")
        elif self.neck_type == "hrfpn":
            from iif_tpu.detection.necks import HRFPN

            self.neck = HRFPN(out_channels=256, num_outs=5,
                              dtype=self.compute_dtype, name="neck")
        elif self.neck_type == "bfp":
            from iif_tpu.detection.necks import BFP

            fpn_cls = nn.remat(FPN) if self.backbone_remat else FPN
            self.neck_fpn = fpn_cls(out_channels=256, num_outs=5,
                                    dtype=self.compute_dtype,
                                    name="neck_fpn")
            self.neck_bfp = BFP(out_channels=256, name="neck")
        else:
            neck_cls = nn.remat(FPN) if self.backbone_remat else FPN
            self.neck = neck_cls(out_channels=256, num_outs=5,
                                 dtype=self.compute_dtype, name="neck")
        if self.with_rpn:
            self.rpn_head = RPNHead(num_anchors=3,
                                    dtype=self.compute_dtype,
                                    name="rpn_head")
        self.bbox_head = Shared2FCBBoxHead(
            self.num_classes, cls_predictor=self.cls_predictor,
            cls_temperature=self.cls_temperature,
            iif_weights=self.iif_weights, cls_init=tuple(self.cls_init),
            name="bbox_head")
        if self.with_mask and self._with_fcn_mask_head():
            self.mask_head = FCNMaskHead(
                self.num_classes, predictor=self.mask_predictor,
                temperature=self.mask_temperature,
                name="mask_head")
        if self.with_mask_iou:
            from iif_tpu.detection.mask_head import MaskIoUHead

            self.mask_iou_head = MaskIoUHead(self.num_classes,
                                             name="mask_iou_head")

    def _with_fcn_mask_head(self) -> bool:
        """PointRend overrides to replace the FCN branch."""
        return True

    # ----------------------------------------------------------- sub-passes
    def extract_feat(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(normalize_if_uint8(images), train=train,
                              return_features=True)
        if self.neck_type == "bfp":
            return self.neck_bfp(self.neck_fpn(feats))
        return self.neck(feats)

    def forward_rpn(self, fpn_feats):
        return self.rpn_head(fpn_feats)

    def forward_bbox(self, roi_feats):
        return self.bbox_head(roi_feats)

    def forward_cls_only(self, embedding):
        return self.bbox_head.cls_only(embedding)

    def forward_mask(self, roi_feats):
        return self.mask_head(roi_feats)

    def forward_mask_for_labels(self, roi_feats, labels):
        return self.mask_head.logits_for_labels(roi_feats, labels)

    def forward_mask_iou(self, mask_feats, mask_pred):
        return self.mask_iou_head(mask_feats, mask_pred)

    def __call__(self, images: jnp.ndarray, train: bool = False):
        """Init/trace path touching every submodule."""
        feats = self.extract_feat(images, train=train)
        rpn_out = self.rpn_head(feats) if self.with_rpn else None
        c = feats[0].shape[-1]
        dummy7 = jnp.zeros((1, 7, 7, c), feats[0].dtype)
        bbox_out = self.bbox_head(dummy7)
        if self.with_mask and self._with_fcn_mask_head():
            dummy14 = jnp.zeros((1, 14, 14, c), feats[0].dtype)
            self.mask_head(dummy14)
            if self.with_mask_iou:
                dummy28 = jnp.zeros((1, 28, 28), feats[0].dtype)
                self.mask_iou_head(dummy14, dummy28)
        return rpn_out, bbox_out


# ------------------------------------------------------------------- config
class DetTrainCfg(NamedTuple):
    rpn_num_samples: int = 256
    rpn_pos_fraction: float = 0.5
    rpn_nms_pre: int = 1000          # candidates/level before NMS
    rpn_max_per_img: int = 1000
    rpn_nms_iou: float = 0.7
    rcnn_num_samples: int = 512
    rcnn_pos_fraction: float = 0.25
    mask_size: int = 28
    num_mask_rois: int = 128         # = rcnn_num_samples * pos_fraction
    mask_gt_stride: int = 1          # gt masks stored at 1/s canvas res
    roi_ext: str = "flat"            # "flat" (XLA gather) | "ml" (Pallas
    #                                   multi-level DMA kernel, custom VJP)


class DetTestCfg(NamedTuple):
    rpn_nms_pre: int = 1000
    rpn_max_per_img: int = 1000
    rpn_nms_iou: float = 0.7
    score_thr: float = 0.05          # LVIS configs use 1e-4
    nms_iou: float = 0.5
    max_per_img: int = 100           # LVIS: 300
    roi_ext: str = "ml"              # "ml" (Pallas, inference default —
    #                                   fwd-only, 1.75-2x) | "flat"
    nms_kind: str = "nms"            # "nms" (exact greedy) | "fast"
    #                                   (YOLACT fast NMS, bbox_nms.py:98)


def model_kwargs_from_cfg(model_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Config dict -> flax module kwargs: drop 'type', convert lists to
    (hashable) tuples, map ``compute_dtype`` strings ('bfloat16' — the
    TPU replacement for the reference's ``fp16 = dict(loss_scale=512)``)
    to jnp dtypes."""
    def _cvt(v):
        if isinstance(v, (list, tuple)):
            return tuple(_cvt(x) for x in v)
        return v

    out = {k: _cvt(v) for k, v in model_cfg.items() if k != "type"}
    dt = out.get("compute_dtype")
    if isinstance(dt, str):
        out["compute_dtype"] = jnp.dtype(dt).type
    return out


def make_anchor_generator() -> AnchorGenerator:
    """RPN anchors of every IIF config: scales [8], ratios [0.5,1,2],
    strides [4, 8, 16, 32, 64]."""
    return AnchorGenerator(strides=[4, 8, 16, 32, 64],
                           ratios=[0.5, 1.0, 2.0], scales=[8.0])


def fpn_shapes(img_hw: Tuple[int, int], num_levels: int = 5):
    h, w = img_hw
    return [(-(-h // s), -(-w // s)) for s in (4, 8, 16, 32, 64)][:num_levels]


def maskrcnn_loss(
    model: MaskRCNN,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    key: jax.Array,
    loss_cls,                       # DetIIFLoss / DetCrossEntropyLoss
    cfg: DetTrainCfg = DetTrainCfg(),
    fasa_state=None,                # FasaState -> enables FASA
    fasa_cfg: Optional[Dict[str, float]] = None,
    epoch: int = 0,
    mesh=None,                      # Mesh with a 'spatial' axis -> the
    #                                 backbone runs on H-sharded canvases
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """Full forward + all losses for one global batch.

    batch keys: image (B,H,W,3) normalized float; gt_boxes (B,G,4);
    gt_labels (B,G); gt_valid (B,G); gt_masks (B,G,H',W') if with_mask;
    img_shape (2,) static padded shape is taken from image.
    Returns (total_loss, loss_dict, aux) with
    aux = {batch_stats, fasa_state?}.
    """
    from iif_tpu.parallel.mesh import constrain_spatial_image, gather_spatial

    images = constrain_spatial_image(batch["image"], mesh)
    b, img_h, img_w, _ = images.shape
    k_rpn, k_rcnn, k_fasa = jax.random.split(key, 3)

    feats, mutated = model.apply(
        variables, images, True, method="extract_feat",
        mutable=["batch_stats"])
    feats = gather_spatial(feats, mesh)

    if model.with_rpn:
        cls_scores, bbox_preds = model.apply(
            variables, feats, method=MaskRCNN.forward_rpn)

        gen = make_anchor_generator()
        shapes = fpn_shapes((img_h, img_w))
        anchors_np = gen.grid_anchors(shapes)
        anchors = jnp.asarray(np.concatenate(anchors_np, axis=0))
        valid = jnp.asarray(np.concatenate(
            gen.valid_flags(shapes, (img_h, img_w)), axis=0))

        l_rpn_cls, l_rpn_bbox = rpn_loss(
            cls_scores, bbox_preds, anchors, valid, batch["gt_boxes"],
            batch["gt_valid"], k_rpn, num_samples=cfg.rpn_num_samples,
            pos_fraction=cfg.rpn_pos_fraction)

        proposals, prop_scores, prop_valid = rpn_proposals(
            [jax.lax.stop_gradient(s) for s in cls_scores],
            [jax.lax.stop_gradient(d) for d in bbox_preds],
            [jnp.asarray(a) for a in anchors_np], (img_h, img_w),
            nms_pre=cfg.rpn_nms_pre, max_per_img=cfg.rpn_max_per_img,
            nms_iou=cfg.rpn_nms_iou)
    else:
        # FastRCNN (fast_rcnn.py): precomputed proposals ride the batch
        proposals = batch["proposals"]
        prop_valid = batch.get(
            "proposals_valid",
            jnp.ones(proposals.shape[:2], bool))

    tgts = bbox_targets(
        k_rcnn, proposals, prop_valid, batch["gt_boxes"],
        batch["gt_labels"], batch["gt_valid"], model.num_classes,
        num_samples=cfg.rcnn_num_samples,
        pos_fraction=cfg.rcnn_pos_fraction)

    # flatten (B, R) rois into batch-indexed (B*R, 5)
    r = cfg.rcnn_num_samples
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)
    rois5 = jnp.concatenate(
        [batch_idx[:, None], tgts.rois.reshape(-1, 4)], axis=1)

    ext_kind = "ml" if cfg.roi_ext == "ml" else False
    extractor = SingleRoIExtractor((7, 7), use_pallas=ext_kind)
    roi_feats = extractor(feats[:4], rois5)
    cls_score, bbox_pred, embedding = model.apply(
        variables, roi_feats, method=MaskRCNN.forward_bbox)

    l_cls, l_bbox = bbox_head_loss(
        cls_score, bbox_pred, tgts, loss_cls, model.num_classes)

    losses = {"loss_cls": l_cls, "loss_bbox": l_bbox}
    if model.with_rpn:
        losses["loss_rpn_cls"] = l_rpn_cls
        losses["loss_rpn_bbox"] = l_rpn_bbox

    aux: Dict[str, Any] = {}
    if fasa_state is not None:
        from iif_tpu.detection.fasa import fasa_aug_loss, fasa_update

        fcfg = fasa_cfg or {}
        labels_flat = tgts.labels.reshape(-1)
        pos_w = tgts.bbox_weights.reshape(-1)
        fasa_state = fasa_update(
            fasa_state, embedding, labels_flat, pos_w,
            decay_ratio=fcfg.get("decay_ratio", 0.1))
        if epoch >= 1:  # virtual-feature aux CE from epoch >= 1
            losses["loss_cls"] = losses["loss_cls"] + fasa_aug_loss(
                fasa_state, k_fasa,
                lambda e: model.apply(variables, e,
                                      method=MaskRCNN.forward_cls_only),
                loss_cls,
                loss_aug_weight=fcfg.get("loss_aug_weight", 0.1))
        aux["fasa_state"] = fasa_state

    if model.with_mask and not model._with_fcn_mask_head():
        # PointRend mask branch: coarse 7x7 FC mask + uncertainty-point
        # refinement losses (point_rend.py)
        from iif_tpu.detection.point_rend import point_rend_mask_loss

        m = cfg.num_mask_rois
        pos_rois5 = rois5.reshape(b, r, 5)[:, :m].reshape(-1, 5)
        losses.update(point_rend_mask_loss(
            model, variables, feats, pos_rois5,
            tgts.labels[:, :m].reshape(-1),
            tgts.pos_gt_inds[:, :m].reshape(-1),
            tgts.bbox_weights[:, :m].reshape(-1),
            resolve_gt_masks(batch, img_w // cfg.mask_gt_stride),
            k_fasa, gt_stride=cfg.mask_gt_stride))
    elif model.with_mask:
        # positives live in the leading slots of each image's slate
        m = cfg.num_mask_rois
        pos_rois5 = rois5.reshape(b, r, 5)[:, :m].reshape(-1, 5)
        pos_w = tgts.bbox_weights[:, :m].reshape(-1)
        pos_gt = tgts.pos_gt_inds[:, :m].reshape(-1)
        pos_labels = tgts.labels[:, :m].reshape(-1)

        mask_extractor = SingleRoIExtractor((14, 14), use_pallas=ext_kind)
        mask_feats = mask_extractor(feats[:4], pos_rois5)
        # per-label logits: avoids the (R, S, S, C) full-logit tensor
        # whose backward scatter is multi-GB at LVIS scale
        cls_idx = jnp.clip(pos_labels, 0, model.num_classes - 1)
        mask_pred = model.apply(
            variables, mask_feats, cls_idx,
            method=MaskRCNN.forward_mask_for_labels)
        gt_masks_dec = resolve_gt_masks(batch, img_w // cfg.mask_gt_stride)
        mask_tgt = mask_targets(
            pos_rois5, pos_gt, gt_masks_dec,
            cfg.mask_size, gt_stride=cfg.mask_gt_stride)
        losses["loss_mask"] = mask_head_loss(
            mask_pred, mask_tgt, pos_labels, pos_w)

        if model.with_mask_iou:
            from iif_tpu.detection.mask_head import (
                mask_area_ratio,
                mask_iou_head_loss,
                mask_iou_targets,
            )

            # no detach in the reference: the IoU loss backprops into
            # the mask head through the sigmoid input too
            iou_pred = model.apply(
                variables, mask_feats, mask_pred,
                method=MaskRCNN.forward_mask_iou)
            pos_iou_pred = jnp.take_along_axis(
                iou_pred, cls_idx[:, None], axis=1)[:, 0]
            ratios = mask_area_ratio(pos_rois5, pos_gt, gt_masks_dec,
                                     gt_stride=cfg.mask_gt_stride)
            iou_tgt = mask_iou_targets(
                jax.lax.stop_gradient(mask_pred), mask_tgt, ratios)
            losses["loss_mask_iou"] = mask_iou_head_loss(
                pos_iou_pred, iou_tgt, pos_w)

    if getattr(model, "with_grid", False):
        # Grid R-CNN branch (grid_rcnn.py): jittered positives -> 9-point
        # heatmaps, sigmoid CE x15 (fused + unfused)
        from iif_tpu.detection.grid_rcnn import grid_loss

        m = cfg.num_mask_rois
        pos_rois5 = rois5.reshape(b, r, 5)[:, :m].reshape(-1, 5)
        pos_gt = tgts.pos_gt_inds[:, :m].reshape(-1)
        img_of = jnp.repeat(jnp.arange(b), m)
        gt_of = batch["gt_boxes"][img_of, pos_gt]
        losses["loss_grid"] = grid_loss(
            model, variables, feats, pos_rois5, gt_of,
            tgts.bbox_weights[:, :m].reshape(-1), k_fasa, (img_h, img_w))

    if getattr(model, "num_stuff_classes", None) is not None \
            and "gt_semantic_seg" in batch:
        # PanopticFPN stuff branch (panoptic.py; reference
        # configs/panoptic_fpn loss_seg weight 0.5)
        from iif_tpu.detection.panoptic import panoptic_semantic_loss

        losses["loss_seg"] = 0.5 * panoptic_semantic_loss(
            model, variables, feats, batch["gt_semantic_seg"])

    total = sum(losses.values())
    aux["batch_stats"] = mutated.get("batch_stats", {})
    return total, losses, aux


def maskrcnn_simple_test(
    model: MaskRCNN,
    variables: Dict[str, Any],
    images: jnp.ndarray,
    loss_cls,
    cfg: DetTestCfg = DetTestCfg(),
    scale_factor: Optional[jnp.ndarray] = None,
    proposals: Optional[jnp.ndarray] = None,       # FastRCNN: (B, P, 4)
    proposals_valid: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Inference: returns fixed-shape per-image detections
    (boxes (B,K,4), scores (B,K), labels (B,K), valid (B,K),
    masks (B,K,28,28) probabilities for the predicted class)."""
    b, img_h, img_w, _ = images.shape
    feats = model.apply(variables, images, False,
                        method="extract_feat")
    if model.with_rpn:
        cls_scores, bbox_preds = model.apply(
            variables, feats, method=MaskRCNN.forward_rpn)

        gen = make_anchor_generator()
        anchors_np = gen.grid_anchors(fpn_shapes((img_h, img_w)))
        proposals, _, prop_valid = rpn_proposals(
            cls_scores, bbox_preds, [jnp.asarray(a) for a in anchors_np],
            (img_h, img_w), nms_pre=cfg.rpn_nms_pre,
            max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)
    else:
        assert proposals is not None, "FastRCNN needs precomputed proposals"
        prop_valid = (proposals_valid if proposals_valid is not None
                      else jnp.ones(proposals.shape[:2], bool))

    p = proposals.shape[1]
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), p)
    rois5 = jnp.concatenate(
        [batch_idx[:, None], proposals.reshape(-1, 4)], axis=1)
    test_ext = "ml" if getattr(cfg, "roi_ext", "ml") == "ml" else False
    extractor = SingleRoIExtractor((7, 7), use_pallas=test_ext)
    roi_feats = extractor(feats[:4], rois5)
    cls_score, bbox_pred, _ = model.apply(
        variables, roi_feats, method=MaskRCNN.forward_bbox)

    cls_score = cls_score.reshape(b, p, -1)
    bbox_pred = bbox_pred.reshape(b, p, -1)
    # suppress padded proposals
    neg_inf = jnp.full_like(cls_score, -1e9)
    cls_score = jnp.where(prop_valid[..., None], cls_score, neg_inf)

    def _one(props, cs, bp):
        return bbox_head_get_bboxes(
            props, cs, bp, (img_h, img_w), loss_cls,
            scale_factor=None, score_thr=cfg.score_thr,
            nms_iou=cfg.nms_iou, max_per_img=cfg.max_per_img,
            num_classes=model.num_classes,
            nms_kind=getattr(cfg, "nms_kind", "nms"))

    dets, scores, labels, det_valid = jax.vmap(_one)(
        proposals, cls_score, bbox_pred)

    out = {"boxes": dets, "scores": scores, "labels": labels,
           "valid": det_valid}

    if getattr(model, "with_grid", False):
        # Grid R-CNN inference: heatmap boundary voting refines boxes
        # (grid_roi_head.py simple_test)
        from iif_tpu.detection.grid_rcnn import (
            GridRCNN,
            grid_refine_boxes,
        )

        k = dets.shape[1]
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), k)
        det_rois = jnp.concatenate(
            [bidx[:, None], dets.reshape(-1, 4)], axis=1)
        g_ext = SingleRoIExtractor((14, 14))
        gfeats = g_ext(feats[:4], det_rois)
        fused, _ = model.apply(variables, gfeats, False,
                               method=GridRCNN.forward_grid)
        refined = grid_refine_boxes(fused, dets.reshape(-1, 4),
                                    (img_h, img_w)).reshape(b, k, 4)
        out["boxes"] = jnp.where(det_valid[..., None], refined,
                                 out["boxes"])
        dets = out["boxes"]

    if model.with_mask and not model._with_fcn_mask_head():
        from iif_tpu.detection.point_rend import point_rend_refine_masks

        k = dets.shape[1]
        batch_idx2 = jnp.repeat(jnp.arange(b, dtype=jnp.float32), k)
        det_rois = jnp.concatenate(
            [batch_idx2[:, None], dets.reshape(-1, 4)], axis=1)
        logits = point_rend_refine_masks(
            model, variables, feats, det_rois,
            labels.reshape(-1),
            subdivision_steps=getattr(cfg, "subdivision_steps", 5))
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        out["masks"] = probs.reshape(b, k, *probs.shape[1:])
    elif model.with_mask:
        k = dets.shape[1]
        batch_idx2 = jnp.repeat(jnp.arange(b, dtype=jnp.float32), k)
        det_rois = jnp.concatenate(
            [batch_idx2[:, None], dets.reshape(-1, 4)], axis=1)
        mask_extractor = SingleRoIExtractor((14, 14), use_pallas=test_ext)
        mfeats = mask_extractor(feats[:4], det_rois)
        cls_idx = jnp.clip(labels.reshape(-1), 0, model.num_classes - 1)
        # fast path: compute only the predicted class's mask channel
        sel = model.apply(variables, mfeats, cls_idx,
                          method=MaskRCNN.forward_mask_for_labels)
        probs = jax.nn.sigmoid(sel.astype(jnp.float32))
        out["masks"] = probs.reshape(b, k, *probs.shape[1:])
        if model.with_mask_iou:
            # Mask Scoring inference (mask_scoring_roi_head.py
            # get_mask_scores): segm score = det score * predicted IoU
            iou_pred = model.apply(variables, mfeats, sel,
                                   method=MaskRCNN.forward_mask_iou)
            sel_iou = jnp.take_along_axis(
                iou_pred, cls_idx[:, None], axis=1)[:, 0].reshape(b, k)
            out["mask_scores"] = out["scores"] * sel_iou

    if scale_factor is not None:
        out["boxes"] = out["boxes"] / scale_factor[:, None, :]
    return out
