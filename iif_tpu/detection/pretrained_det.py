"""mmdet checkpoint ingestion: reference-trained ``.pth`` -> iif_tpu
variables.

Lets a user of the reference repo bring an mmdet-format MaskRCNN (the
IIF/FASA LVIS models, ``mmdet/models/detectors/mask_rcnn.py`` naming)
or single-stage RetinaNet/FCOS checkpoint into this stack for
eval/finetune. Layout conversions:

- convs: OIHW -> HWIO; the backbone reuses
  ``iif_tpu.models.pretrained.convert_torch_resnet``.
- first shared FC: torch flattens CHW, we flatten HWC — the input dim is
  permuted accordingly.
- mask upsample: torch ``ConvTranspose2d`` (in,out,kh,kw) -> flax kernel
  ``transpose(2,3,0,1)`` + spatial flip (verified numerically; the two
  frameworks' transposed convs differ by a kernel mirror).
- Linear: (out,in) -> (in,out); NormedLinear keeps the same layout.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from iif_tpu.models.pretrained import _assign, convert_torch_resnet


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def _conv(v):
    return _np(v).transpose(2, 3, 1, 0)          # OIHW -> HWIO


def _fc(v):
    return _np(v).T                              # (out,in) -> (in,out)


def _fc_first_shared(v, ch: int = 256, side: int = 7):
    """shared_fcs.0: permute the flattened-input dim CHW -> HWC."""
    v = _np(v)                                   # (out, ch*side*side)
    out = v.shape[0]
    return (v.reshape(out, ch, side, side).transpose(0, 2, 3, 1)
            .reshape(out, side * side * ch).T)


def convert_mmdet_maskrcnn(
    state_dict: Dict[str, Any],
    num_classes: Optional[int] = None,
) -> Tuple[Dict, Dict]:
    """mmdet MaskRCNN/IIF state_dict -> (params, batch_stats) pytrees
    matching ``iif_tpu.detection.detector.MaskRCNN``.

    ``num_classes``: when given and the checkpoint's fc_cls disagrees,
    the classification/regression/mask predictors are dropped (fresh
    init at the caller) — the mismatched-head swap.
    """
    params: Dict = {}
    batch_stats: Dict = {}

    bb = {k[len("backbone."):]: v for k, v in state_dict.items()
          if k.startswith("backbone.")}
    bb_params, bb_stats = convert_torch_resnet(bb)
    params["backbone"] = bb_params
    batch_stats["backbone"] = bb_stats

    ckpt_classes = None
    for key in ("roi_head.bbox_head.fc_cls.weight",):
        if key in state_dict:
            ckpt_classes = _np(state_dict[key]).shape[0] - 1
    keep_heads = num_classes is None or ckpt_classes in (None, num_classes)

    for name, t in state_dict.items():
        parts = name.split(".")
        if parts[0] == "backbone":
            continue
        if parts[0] == "neck":
            # neck.lateral_convs.{i}.conv.{weight,bias} / fpn_convs...
            i = parts[2]
            ours = (f"lateral_{i}" if parts[1] == "lateral_convs"
                    else f"fpn_conv_{i}")
            leaf = parts[-1]
            _assign(params, ("neck", ours,
                             "kernel" if leaf == "weight" else "bias"),
                    _conv(t) if leaf == "weight" else _np(t))
        elif parts[0] == "rpn_head":
            leaf = parts[-1]
            _assign(params, ("rpn_head", parts[1],
                             "kernel" if leaf == "weight" else "bias"),
                    _conv(t) if leaf == "weight" else _np(t))
        elif name.startswith("roi_head.bbox_head."):
            sub = parts[2]
            leaf = parts[-1]
            if sub == "shared_fcs":
                ours = f"shared_fc{int(parts[3]) + 1}"
                v = (_fc_first_shared(t) if parts[3] == "0"
                     and leaf == "weight" else
                     _fc(t) if leaf == "weight" else _np(t))
                _assign(params, ("bbox_head", ours,
                                 "kernel" if leaf == "weight" else "bias"),
                        v)
            elif sub in ("fc_cls", "fc_reg"):
                if not keep_heads:
                    continue
                _assign(params, ("bbox_head", sub,
                                 "kernel" if leaf == "weight" else "bias"),
                        _fc(t) if leaf == "weight" else _np(t))
        elif name.startswith("roi_head.mask_head."):
            sub = parts[2]
            leaf = parts[-1]
            if sub == "convs":
                ours = f"conv{parts[3]}"
                _assign(params, ("mask_head", ours,
                                 "kernel" if leaf == "weight" else "bias"),
                        _conv(t) if leaf == "weight" else _np(t))
            elif sub == "upsample":
                v = _np(t)
                if leaf == "weight":   # (in,out,kh,kw) -> flipped HWIO
                    v = v.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
                _assign(params, ("mask_head", "upsample",
                                 "kernel" if leaf == "weight" else "bias"),
                        v)
            elif sub == "conv_logits":
                if not keep_heads:
                    continue
                _assign(params, ("mask_head", "conv_logits",
                                 "kernel" if leaf == "weight" else "bias"),
                        _conv(t) if leaf == "weight" else _np(t))
        # rpn/roi extras (num_batches_tracked etc) skipped

    return params, batch_stats


def convert_mmdet_single_stage(
    state_dict: Dict[str, Any],
    num_classes: Optional[int] = None,
) -> Tuple[Dict, Dict]:
    """mmdet RetinaNet/FCOS state_dict -> (params, batch_stats) pytrees
    matching ``iif_tpu.detection.single_stage.RetinaNet``/``FCOS``
    (mmdet namings: ``retina_head.py``, ``fcos_head.py``, ``fpn.py``
    ``add_extra_convs`` fpn_convs tail).

    FPN index convention: mmdet keeps P6/P7 extra convs inside
    ``fpn_convs`` after the ``len(lateral_convs)`` real outputs; here
    they split into ``fpn_conv_{i}`` / ``extra_conv_{j}``.
    """
    import re

    params: Dict = {}
    batch_stats: Dict = {}

    bb = {k[len("backbone."):]: v for k, v in state_dict.items()
          if k.startswith("backbone.")}
    bb_params, bb_stats = convert_torch_resnet(bb)
    params["backbone"] = bb_params
    batch_stats["backbone"] = bb_stats

    n_lateral = len({m.group(1) for m in (
        re.match(r"neck\.lateral_convs\.(\d+)\.conv\.weight", k)
        for k in state_dict) if m})

    ckpt_classes = None
    if "bbox_head.retina_cls.weight" in state_dict:
        a = _np(state_dict["bbox_head.retina_reg.weight"]).shape[0] // 4
        ckpt_classes = _np(
            state_dict["bbox_head.retina_cls.weight"]).shape[0] // a
    elif "bbox_head.conv_cls.weight" in state_dict:
        ckpt_classes = _np(state_dict["bbox_head.conv_cls.weight"]).shape[0]
    keep_heads = num_classes is None or ckpt_classes in (None, num_classes)
    predictors = ("retina_cls", "retina_reg", "conv_cls", "conv_reg",
                  "conv_centerness")

    for name, t in state_dict.items():
        parts = name.split(".")
        leaf = parts[-1]
        if parts[0] == "backbone":
            continue
        if parts[0] == "neck":
            i = int(parts[2])
            if parts[1] == "lateral_convs":
                ours = f"lateral_{i}"
            elif i < n_lateral:
                ours = f"fpn_conv_{i}"
            else:
                ours = f"extra_conv_{i - n_lateral}"
            _assign(params, ("neck", ours,
                             "kernel" if leaf == "weight" else "bias"),
                    _conv(t) if leaf == "weight" else _np(t))
        elif parts[0] == "bbox_head":
            sub = parts[1]
            if sub in ("cls_convs", "reg_convs"):
                i, kind = parts[2], parts[3]
                prefix = sub[:3]            # 'cls' | 'reg'
                if kind == "conv":
                    _assign(params, ("bbox_head", f"{prefix}_conv_{i}",
                                     "kernel" if leaf == "weight"
                                     else "bias"),
                            _conv(t) if leaf == "weight" else _np(t))
                elif kind == "gn":
                    _assign(params, ("bbox_head", f"{prefix}_gn_{i}",
                                     "scale" if leaf == "weight"
                                     else "bias"), _np(t))
            elif sub in predictors:
                if not keep_heads:
                    continue
                _assign(params, ("bbox_head", sub,
                                 "kernel" if leaf == "weight" else "bias"),
                        _conv(t) if leaf == "weight" else _np(t))
            elif sub == "scales":
                _assign(params, ("bbox_head", f"scale_{parts[2]}"),
                        _np(t).reshape(()))
        # num_batches_tracked and unknowns skipped

    return params, batch_stats


def load_mmdet_checkpoint(path: str, num_classes: Optional[int] = None
                          ) -> Tuple[Dict, Dict]:
    """Load an mmdet ``.pth`` (plain or runner checkpoint) and convert.

    Dispatches on the state dict's own keys: ``roi_head.*`` -> two-stage
    MaskRCNN layout; retina/FCOS predictor keys -> single-stage."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("state_dict", "model"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    ckpt = {k.replace("module.", ""): v for k, v in ckpt.items()}
    if any(k.startswith("bbox_head.retina_cls")
           or k.startswith("bbox_head.conv_centerness") for k in ckpt):
        return convert_mmdet_single_stage(ckpt, num_classes)
    return convert_mmdet_maskrcnn(ckpt, num_classes)
