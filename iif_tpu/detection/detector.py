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
    cls_channels: int = 0             # 0 -> C+1; SeesawLoss needs C+2
    # 'shared2fc' | 'double' (Double-Head R-CNN, double_roi_head.py)
    bbox_head_type: str = "shared2fc"
    reg_roi_scale_factor: float = 1.3  # double head's reg-branch roi scale
    # 'single' | 'groie' (generic_roi_extractor.py: all-level sum with
    # shared pre-conv + attention post module; configs/groie)
    roi_extractor_type: str = "single"
    # per-stage deformable convs, e.g. ("", "dcn", "dcn", "dcn")
    # (configs/dcn stage_with_dcn); 'dcnv2' for modulated
    dcn: tuple = ()
    # '' (BN trunk) | 'gn': GroupNorm(32) everywhere — backbone, neck,
    # bbox convs, mask head (reference configs/gn 'gn-all',
    # configs/scratch). conv_ws additionally weight-standardizes every
    # trunk conv (configs/gn+ws 'gn_ws-all').
    norm: str = ""
    conv_ws: bool = False
    # GCNet ContextBlock per-stage flags + ratio (configs/gcnet) and
    # GeneralizedAttention per-stage flags + 4-bit type
    # (configs/empirical_attention)
    gcb: tuple = ()
    gcb_ratio: float = 0.25
    gen_attention: str = ""
    gen_attention_stages: tuple = ()
    # extra shared convs before the bbox fcs: the gn/gn+ws recipes use
    # the 4conv1fc head (num_shared_convs=4, num_shared_fcs=1)
    bbox_head_convs: int = 0
    bbox_head_fcs: int = 2
    # space-to-depth rewrite of the 7x7/s2 stem conv (exact math, same
    # params — pure TPU/MXU layout win; models/resnet.py S2DStemConv)
    s2d_stem: bool = False

    def setup(self):
        self.backbone = build_backbone(
            self.backbone_type, depth=self.depth,
            frozen_stages=self.frozen_stages, norm_eval=self.norm_eval,
            remat=self.backbone_remat, dcn=tuple(self.dcn),
            norm=self.norm, conv_ws=self.conv_ws,
            gcb=tuple(self.gcb), gcb_ratio=self.gcb_ratio,
            gen_attention=self.gen_attention,
            gen_attention_stages=tuple(self.gen_attention_stages),
            s2d_stem=self.s2d_stem, dtype=self.compute_dtype)
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
        elif self.neck_type == "carafe":
            from iif_tpu.detection.necks import FPNCarafe

            self.neck = FPNCarafe(out_channels=256, num_outs=5,
                                  dtype=self.compute_dtype, name="neck")
        elif self.neck_type == "fpg":
            from iif_tpu.detection.necks import FPG

            self.neck = FPG(out_channels=256, num_outs=5,
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
                                 norm=self.norm, conv_ws=self.conv_ws,
                                 dtype=self.compute_dtype, name="neck")
        if self.with_rpn:
            self.rpn_head = RPNHead(num_anchors=3,
                                    dtype=self.compute_dtype,
                                    name="rpn_head")
        if self.bbox_head_type == "double":
            from iif_tpu.detection.bbox_head import DoubleConvFCBBoxHead

            self.bbox_head = DoubleConvFCBBoxHead(
                self.num_classes, name="bbox_head")
        elif self.bbox_head_type == "sabl":
            from iif_tpu.detection.sabl import SABLHead

            self.bbox_head = SABLHead(self.num_classes, name="bbox_head")
        else:
            self.bbox_head = Shared2FCBBoxHead(
                self.num_classes, cls_predictor=self.cls_predictor,
                cls_temperature=self.cls_temperature,
                iif_weights=self.iif_weights, cls_init=tuple(self.cls_init),
                cls_channels=self.cls_channels,
                num_shared_convs=self.bbox_head_convs,
                num_shared_fcs=self.bbox_head_fcs,
                norm=self.norm, conv_ws=self.conv_ws,
                name="bbox_head")
        if self.with_mask and self._with_fcn_mask_head():
            self.mask_head = FCNMaskHead(
                self.num_classes, predictor=self.mask_predictor,
                temperature=self.mask_temperature,
                norm=self.norm, conv_ws=self.conv_ws,
                name="mask_head")
        if self.with_mask_iou:
            from iif_tpu.detection.mask_head import MaskIoUHead

            self.mask_iou_head = MaskIoUHead(self.num_classes,
                                             name="mask_iou_head")
        if self.roi_extractor_type == "groie":
            from iif_tpu.detection.roi_extractor import GenericRoIExtractor

            self.groie_bbox = GenericRoIExtractor(output_size=7,
                                                  name="groie_bbox")
            if self.with_mask:
                self.groie_mask = GenericRoIExtractor(output_size=14,
                                                      name="groie_mask")

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

    def forward_bbox_double(self, cls_feats, reg_feats,
                            train: bool = False):
        return self.bbox_head(cls_feats, reg_feats, train=train)

    def forward_groie_bbox(self, feats, rois5):
        return self.groie_bbox(feats, rois5)

    def forward_groie_mask(self, feats, rois5):
        return self.groie_mask(feats, rois5)

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
        if self.roi_extractor_type == "groie":
            dummy_rois = jnp.asarray([[0.0, 0.0, 0.0, 16.0, 16.0]])
            self.groie_bbox(feats[:4], dummy_rois)
            if self.with_mask:
                self.groie_mask(feats[:4], dummy_rois)
        dummy7 = jnp.zeros((1, 7, 7, c), feats[0].dtype)
        if self.bbox_head_type == "double":
            bbox_out = self.bbox_head(dummy7, dummy7, train=train)
        else:
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
    rcnn_loss_bbox: str = "l1"       # 'l1' | 'smooth_l1' | 'balanced_l1'
    # proposal sampler family (mmdet/core/bbox/samplers/): pos 'random' |
    # 'instance_balanced' | 'ohem'; neg 'random' | 'iou_balanced' |
    # 'ohem' | 'score_hlr'. sampler_cfg: (('floor_thr',-1.), ...) pairs.
    rcnn_pos_sampler: str = "random"
    rcnn_neg_sampler: str = "random"
    rcnn_sampler_cfg: tuple = ()
    # Dynamic R-CNN (dynamic_roi_head.py): adapt assigner IoU + SmoothL1
    # beta from training statistics; implies rcnn_loss_bbox='smooth_l1'
    rcnn_dynamic: bool = False
    dynamic_iou_topk: int = 75
    dynamic_beta_topk: int = 10
    dynamic_interval: int = 100
    dynamic_initial_iou: float = 0.4
    dynamic_initial_beta: float = 1.0
    # PISA (pisa_roi_head.py): (('k',2.),('bias',0.)) enables ISR-P
    # label reweighting; (('k',1.),('bias',0.2)) enables the CARL loss
    rcnn_isr: tuple = ()
    rcnn_carl: tuple = ()


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
    mask_thr_binary: float = 0.5     # paste-mask binarization threshold
    #   (reference rcnn test_cfg; the published 26.3 LVIS number uses
    #   0.4 at inference — README "Note" under Pretrained Models)


def build_backbone(backbone_type: str, depth: int = 50,
                   frozen_stages: int = 1, norm_eval: bool = True,
                   remat: bool = False, dcn: tuple = (),
                   norm: str = "bn", conv_ws: bool = False,
                   gcb: tuple = (), gcb_ratio: float = 0.25,
                   gen_attention: str = "",
                   gen_attention_stages: tuple = (),
                   s2d_stem: bool = False,
                   dtype=None, name: str = "backbone"):
    """Backbone registry shared by every detector body (the reference's
    ``build_backbone``, mmdet/models/builder.py): 'resnet' (+
    'resnext<G>x<W>', configs/*x101*), 'swin-{t,s,b}', 'res2net'
    (configs/res2net), 'regnetx_*' (configs/regnet), 'hrnet-w{18,32,40}'
    (configs/hrnet), 'mobilenet_v2', 'pvt-{tiny,small,medium,large}'
    (configs/pvt), 'resnest' (configs/resnest)."""
    if backbone_type.startswith("swin"):
        from iif_tpu.models.swin import swin_b, swin_s, swin_t

        ctor = {"swin-t": swin_t, "swin-s": swin_s,
                "swin-b": swin_b}[backbone_type]
        return ctor(drop_path_rate=0.0, frozen_stages=frozen_stages,
                    dtype=dtype, name=name)
    if backbone_type == "res2net":
        from iif_tpu.models.res2net import Res2Net

        layers = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[depth]
        return Res2Net(layers=layers, frozen_stages=frozen_stages,
                       norm_eval=norm_eval, dtype=dtype, name=name)
    if backbone_type.startswith("regnetx"):
        from iif_tpu.models.regnet import RegNet

        return RegNet(arch=backbone_type, frozen_stages=frozen_stages,
                      norm_eval=norm_eval, dtype=dtype, name=name)
    if backbone_type.startswith("hrnet"):
        from iif_tpu.models.hrnet import HRNet

        return HRNet(width=int(backbone_type[7:]), norm_eval=norm_eval,
                     dtype=dtype, name=name)
    if backbone_type == "mobilenet_v2":
        from iif_tpu.models.mobilenet_v2 import MobileNetV2

        return MobileNetV2(norm_eval=norm_eval, dtype=dtype, name=name)
    if backbone_type.startswith("pvt"):
        from iif_tpu.models.pvt import PVT

        return PVT(arch=backbone_type.split("-")[1], norm_eval=norm_eval,
                   dtype=dtype, name=name)
    if backbone_type == "resnest":
        from iif_tpu.models.resnest import ResNeSt

        return ResNeSt(depth=depth, frozen_stages=frozen_stages,
                       norm_eval=norm_eval, dtype=dtype, name=name)
    groups, base_width = 1, 64
    if backbone_type.startswith("resnext"):
        g, w = backbone_type[len("resnext"):].split("x")
        groups, base_width = int(g), int(w.rstrip("d"))
    layers, block = _DEPTH_LAYERS[depth]
    return ResNet(layers=layers, block=block, groups=groups,
                  width_per_group=base_width, frozen_stages=frozen_stages,
                  norm_eval=norm_eval, remat=remat,
                  norm=norm or "bn", conv_ws=conv_ws,
                  gcb_stages=tuple(gcb), gcb_ratio=gcb_ratio,
                  gen_attention=gen_attention or "1111",
                  gen_attention_stages=tuple(gen_attention_stages),
                  dcn_stages=tuple(dcn), s2d_stem=s2d_stem,
                  dtype=dtype, name=name)


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
    dynamic_state=None,             # DynamicRCNNState (cfg.rcnn_dynamic)
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

    cand_score = cand_pred = None
    needs_cand = (cfg.rcnn_pos_sampler == "ohem"
                  or cfg.rcnn_neg_sampler in ("ohem", "score_hlr"))
    if needs_cand:
        # OHEM / score-HLR score every candidate with a no-grad head
        # forward first (ohem_sampler.py:31-50, score_hlr_sampler.py:131)
        cand = jnp.concatenate([batch["gt_boxes"], proposals], axis=1)
        nc = cand.shape[1]
        cidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), nc)
        crois5 = jnp.concatenate(
            [cidx[:, None], cand.reshape(-1, 4)], axis=1)
        cfeats = [jax.lax.stop_gradient(f) for f in feats[:4]]
        c_ext = SingleRoIExtractor((7, 7), use_pallas=False)
        c_roi_feats = c_ext(cfeats, crois5)
        if model.bbox_head_type == "double":
            c_reg = c_ext(cfeats, crois5,
                          roi_scale_factor=model.reg_roi_scale_factor)
            c_cls, c_pred, _ = model.apply(
                variables, c_roi_feats, c_reg,
                method=MaskRCNN.forward_bbox_double)
        else:
            c_cls, c_pred, _ = model.apply(
                variables, c_roi_feats, method=MaskRCNN.forward_bbox)
        cand_score = jax.lax.stop_gradient(c_cls).reshape(b, nc, -1)
        cand_pred = jax.lax.stop_gradient(c_pred).reshape(b, nc, -1)

    iou_kw = {}
    if dynamic_state is not None:
        # Dynamic R-CNN: the adaptive threshold drives the assigner
        iou_kw = dict(pos_iou_thr=dynamic_state.iou_thr,
                      neg_iou_thr=dynamic_state.iou_thr,
                      min_pos_iou=dynamic_state.iou_thr)
    tgts = bbox_targets(
        k_rcnn, proposals, prop_valid, batch["gt_boxes"],
        batch["gt_labels"], batch["gt_valid"], model.num_classes,
        num_samples=cfg.rcnn_num_samples,
        pos_fraction=cfg.rcnn_pos_fraction,
        pos_sampler=cfg.rcnn_pos_sampler,
        neg_sampler=cfg.rcnn_neg_sampler,
        sampler_cfg=dict(cfg.rcnn_sampler_cfg),
        cand_cls_score=cand_score, cand_bbox_pred=cand_pred,
        loss_cls=loss_cls, **iou_kw)

    # flatten (B, R) rois into batch-indexed (B*R, 5)
    r = cfg.rcnn_num_samples
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)
    rois5 = jnp.concatenate(
        [batch_idx[:, None], tgts.rois.reshape(-1, 4)], axis=1)

    ext_kind = "ml" if cfg.roi_ext == "ml" else False
    extractor = SingleRoIExtractor((7, 7), use_pallas=ext_kind)
    if model.roi_extractor_type == "groie":
        roi_feats = model.apply(variables, feats[:4], rois5,
                                method=MaskRCNN.forward_groie_bbox)
    else:
        roi_feats = extractor(feats[:4], rois5)
    if model.bbox_head_type == "double":
        # two-stream head with BN: thread the already-mutated stats in so
        # the head's BN updates merge with the backbone's
        reg_feats = extractor(feats[:4], rois5,
                              roi_scale_factor=model.reg_roi_scale_factor)
        vars2 = dict(variables)
        vars2["batch_stats"] = mutated.get(
            "batch_stats", variables.get("batch_stats", {}))
        (cls_score, bbox_pred, embedding), mutated = model.apply(
            vars2, roi_feats, reg_feats, True,
            method=MaskRCNN.forward_bbox_double, mutable=["batch_stats"])
    else:
        cls_score, bbox_pred, embedding = model.apply(
            variables, roi_feats, method=MaskRCNN.forward_bbox)

    aux: Dict[str, Any] = {}
    from iif_tpu.detection.losses_extra import SeesawLoss

    if isinstance(loss_cls, SeesawLoss):
        # the reference accumulates cum_samples inside forward
        # (seesaw_loss.py:229-233); here the new counts ride aux and the
        # trainer threads them back into the next step's loss object
        import dataclasses as _dc

        new_cum = loss_cls.update_cum(tgts.labels.reshape(-1),
                                      tgts.label_weights.reshape(-1))
        loss_cls = _dc.replace(loss_cls, cum_samples=new_cum)
        aux["seesaw_cum"] = new_cum

    if dynamic_state is not None:
        from iif_tpu.detection.dynamic_rcnn import (
            dynamic_rcnn_beta_stat,
            dynamic_rcnn_iou_stat,
            dynamic_rcnn_update,
        )

        cur_iou = dynamic_rcnn_iou_stat(
            proposals, prop_valid, batch["gt_boxes"], batch["gt_valid"],
            iou_topk=cfg.dynamic_iou_topk)
        cur_beta = dynamic_rcnn_beta_stat(
            tgts.bbox_targets.reshape(-1, 4),
            tgts.bbox_weights.reshape(-1) > 0,
            cfg.dynamic_beta_topk * b)
        aux["dynamic_state"] = dynamic_rcnn_update(
            dynamic_state, cur_iou, cur_beta,
            initial_iou=cfg.dynamic_initial_iou,
            initial_beta=cfg.dynamic_initial_beta)

    if cfg.rcnn_isr:
        # PISA ISR-P: reweight positive label weights by IoU-HLR
        # (pisa_roi_head.py:131-143, pisa_loss.py:9-119)
        from iif_tpu.detection.losses_extra import isr_p

        from iif_tpu.detection.bbox_head import (
            BBOX_TARGET_MEANS,
            BBOX_TARGET_STDS,
        )
        from iif_tpu.ops.boxes import delta2bbox

        isr_cfg = dict(cfg.rcnn_isr)
        g = batch["gt_boxes"].shape[1]
        rois_flat = tgts.rois.reshape(-1, 4)
        labels_flat = tgts.labels.reshape(-1)
        lw_flat = tgts.label_weights.reshape(-1)
        det_pred = jax.lax.stop_gradient(
            bbox_pred.reshape(-1, model.num_classes, 4))
        sel = jnp.take_along_axis(
            det_pred, jnp.clip(labels_flat, 0, model.num_classes - 1)
            [:, None, None].repeat(4, -1), axis=1)[:, 0]
        from iif_tpu.ops.boxes import bbox_overlaps_aligned

        dec_pred = delta2bbox(rois_flat, sel, BBOX_TARGET_MEANS,
                              BBOX_TARGET_STDS)
        dec_tgt = delta2bbox(rois_flat, tgts.bbox_targets.reshape(-1, 4),
                             BBOX_TARGET_MEANS, BBOX_TARGET_STDS)
        ious = bbox_overlaps_aligned(dec_pred, dec_tgt)
        ious = jax.lax.stop_gradient(ious)
        gt_global = (tgts.pos_gt_inds
                     + jnp.arange(b)[:, None] * g).reshape(-1)
        new_lw = isr_p(jax.lax.stop_gradient(cls_score), labels_flat,
                       lw_flat, ious, gt_global, loss_cls,
                       model.num_classes, k=isr_cfg.get("k", 2.0),
                       bias=isr_cfg.get("bias", 0.0))
        tgts = tgts._replace(
            label_weights=new_lw.reshape(tgts.label_weights.shape))

    frac_weights = bool(cfg.rcnn_isr) or cfg.rcnn_neg_sampler == "score_hlr"
    if model.bbox_head_type == "sabl":
        # side-aware bucketing losses replace the delta regression
        # (sabl_head.py loss; bucket targets from the sampled slate)
        from iif_tpu.detection.sabl import sabl_bbox_loss

        labels_flat = tgts.labels.reshape(-1)
        lw_flat = tgts.label_weights.reshape(-1)
        l_cls = loss_cls(
            cls_score, labels_flat, weight=lw_flat,
            avg_factor=(lw_flat > 0).astype(jnp.float32).sum())
        g = batch["gt_boxes"].shape[1]
        matched_gt = jnp.take_along_axis(
            batch["gt_boxes"],
            jnp.clip(tgts.pos_gt_inds, 0, g - 1)[..., None].repeat(4, -1),
            axis=1)
        bcls, boff = bbox_pred
        l_bbox_cls, l_bbox_reg = sabl_bbox_loss(
            bcls, boff, tgts.rois.reshape(-1, 4),
            matched_gt.reshape(-1, 4),
            tgts.bbox_weights.reshape(-1) > 0)
        losses = {"loss_cls": l_cls, "loss_bbox_cls": l_bbox_cls,
                  "loss_bbox_reg": l_bbox_reg}
        if model.with_rpn:
            losses["loss_rpn_cls"] = l_rpn_cls
            losses["loss_rpn_bbox"] = l_rpn_bbox
        aux["batch_stats"] = mutated.get("batch_stats", {})
        total = sum(losses.values())
        return total, losses, aux

    l_cls, l_bbox = bbox_head_loss(
        cls_score, bbox_pred, tgts, loss_cls, model.num_classes,
        loss_bbox=("smooth_l1" if dynamic_state is not None
                   else cfg.rcnn_loss_bbox),
        smooth_l1_beta=(dynamic_state.beta if dynamic_state is not None
                        else 1.0),
        avg_mode="nonzero" if frac_weights else "sum")

    losses = {"loss_cls": l_cls, "loss_bbox": l_bbox}

    if cfg.rcnn_carl:
        from iif_tpu.detection.losses import smooth_l1_loss
        from iif_tpu.detection.losses_extra import carl_loss

        carl_cfg = dict(cfg.rcnn_carl)
        sel_grad = jnp.take_along_axis(
            bbox_pred.reshape(-1, model.num_classes, 4),
            jnp.clip(tgts.labels.reshape(-1), 0, model.num_classes - 1)
            [:, None, None].repeat(4, -1), axis=1)[:, 0]
        losses["loss_carl"] = carl_loss(
            cls_score, tgts.labels.reshape(-1),
            tgts.label_weights.reshape(-1), sel_grad,
            tgts.bbox_targets.reshape(-1, 4),
            lambda p, t: smooth_l1_loss(p, t, beta=1.0),
            model.num_classes, k=carl_cfg.get("k", 1.0),
            bias=carl_cfg.get("bias", 0.2))
    if model.with_rpn:
        losses["loss_rpn_cls"] = l_rpn_cls
        losses["loss_rpn_bbox"] = l_rpn_bbox

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

        if model.roi_extractor_type == "groie":
            mask_feats = model.apply(variables, feats[:4], pos_rois5,
                                     method=MaskRCNN.forward_groie_mask)
        else:
            mask_extractor = SingleRoIExtractor((14, 14),
                                                use_pallas=ext_kind)
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
    if model.roi_extractor_type == "groie":
        roi_feats = model.apply(variables, feats[:4], rois5,
                                method=MaskRCNN.forward_groie_bbox)
    else:
        roi_feats = extractor(feats[:4], rois5)
    if model.bbox_head_type == "double":
        reg_feats = extractor(feats[:4], rois5,
                              roi_scale_factor=model.reg_roi_scale_factor)
        cls_score, bbox_pred, _ = model.apply(
            variables, roi_feats, reg_feats,
            method=MaskRCNN.forward_bbox_double)
    else:
        cls_score, bbox_pred, _ = model.apply(
            variables, roi_feats, method=MaskRCNN.forward_bbox)

    if model.bbox_head_type == "sabl":
        # bucketing decode + confidence-rescored multiclass NMS
        # (sabl_head.py get_bboxes: score_factors=confids)
        from iif_tpu.detection.sabl import bucket2bbox
        from iif_tpu.ops.nms import multiclass_nms

        bcls, boff = bbox_pred
        boxes_flat, conf_flat = bucket2bbox(
            rois5[:, 1:], bcls, boff, max_shape=(img_h, img_w))
        cls_score = cls_score.reshape(b, p, -1)
        cls_score = jnp.where(prop_valid[..., None], cls_score,
                              jnp.full_like(cls_score, -1e9))
        sc = jax.nn.softmax(cls_score.astype(jnp.float32), axis=-1)
        sc = sc.at[..., :model.num_classes].multiply(
            conf_flat.reshape(b, p)[..., None])

        def _one_sabl(bx, s):
            return multiclass_nms(bx, s, cfg.score_thr, cfg.nms_iou,
                                  cfg.max_per_img)

        dets, scores, labels, det_valid = jax.vmap(_one_sabl)(
            boxes_flat.reshape(b, p, 4), sc)
    else:
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
        if model.roi_extractor_type == "groie":
            mfeats = model.apply(variables, feats[:4], det_rois,
                                 method=MaskRCNN.forward_groie_mask)
        else:
            mask_extractor = SingleRoIExtractor((14, 14),
                                                use_pallas=test_ext)
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
