"""Pretrained-weight ingestion: torch ResNet state_dicts -> flax pytrees.

Rebuild of the reference's pretrained loading
(``classification/resnet_pytorch.py:383-397``): ingest torchvision-format
checkpoints (from a local ``.pth`` path), converting NCHW/OIHW tensors to
NHWC/HWIO, BN running stats to flax ``batch_stats``, and swapping the
classifier when the checkpoint's head size mismatches the long-tailed
head (`:383-397` mismatched-classifier swap).

Works for both the big ResNet family (``iif_tpu/models/resnet.py``) and
the CIFAR ResNet-s (same ``layer{s}_{i}`` naming).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _assign(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    d = tree
    for k in path[:-1]:
        d = d.setdefault(k, {})
    d[path[-1]] = value


def convert_torch_resnet(
    state_dict: Dict[str, Any],
    num_classes: Optional[int] = None,
) -> Tuple[Dict, Dict]:
    """torch ResNet state_dict -> (params, batch_stats) dicts.

    ``num_classes``: if given and different from the checkpoint's fc size,
    the classifier weights are dropped (caller keeps its fresh init) —
    the reference's mismatched-classifier swap.
    """
    params: Dict = {}
    batch_stats: Dict = {}

    def _np(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                          else t)

    fc_out = None
    if "fc.weight" in state_dict:
        fc_out = _np(state_dict["fc.weight"]).shape[0]
    elif "linear.weight" in state_dict:
        fc_out = _np(state_dict["linear.weight"]).shape[0]
    keep_fc = num_classes is None or fc_out == num_classes

    for name, t in state_dict.items():
        v = _np(t)
        parts = name.split(".")
        if parts[0] in ("fc", "linear"):
            if not keep_fc:
                continue
            if parts[1] == "weight":
                _assign(params, ("linear", "kernel"), v.T)
            elif parts[1] == "bias":
                _assign(params, ("linear", "bias"), v)
            continue
        if parts[0] in ("conv1",):
            _assign(params, ("conv1", "kernel"), v.transpose(2, 3, 1, 0))
            continue
        if parts[0] == "bn1":
            _map_bn(params, batch_stats, ("bn1",), parts[1], v)
            continue
        if parts[0].startswith("layer"):
            stage = parts[0][len("layer"):]
            block = parts[1]
            mod = parts[2]
            leaf = parts[3]
            base = (f"layer{stage}_{block}",)
            if mod.startswith("conv"):
                _assign(params, base + (mod, "kernel"),
                        v.transpose(2, 3, 1, 0))
            elif mod.startswith("bn"):
                _map_bn(params, batch_stats, base + (mod,), leaf, v)
            elif mod == "downsample":
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                leaf2 = parts[4]
                if sub == "downsample_conv":
                    _assign(params, base + (sub, "kernel"),
                            v.transpose(2, 3, 1, 0))
                else:
                    _map_bn(params, batch_stats, base + (sub,), leaf2, v)
            elif mod == "shortcut" and len(parts) >= 5:
                # CIFAR option-B shortcuts (unused for option A)
                sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
                if sub == "downsample_conv":
                    _assign(params, base + (sub, "kernel"),
                            v.transpose(2, 3, 1, 0))
                else:
                    _map_bn(params, batch_stats, base + (sub,), parts[4], v)
            continue
        # num_batches_tracked and unknowns are skipped

    return params, batch_stats


def _map_bn(params, batch_stats, base, leaf, v):
    if leaf == "weight":
        _assign(params, base + ("scale",), v)
    elif leaf == "bias":
        _assign(params, base + ("bias",), v)
    elif leaf == "running_mean":
        _assign(batch_stats, base + ("mean",), v)
    elif leaf == "running_var":
        _assign(batch_stats, base + ("var",), v)


def load_torch_checkpoint(path: str, num_classes: Optional[int] = None,
                          prefix: Optional[str] = None
                          ) -> Tuple[Dict, Dict]:
    """Load a ``.pth`` file (optionally a trainer checkpoint with a
    ``model``/``state_dict`` key) and convert.

    ``prefix``: keep only keys under this prefix and strip it — the
    reference's ``init_cfg=dict(type='Pretrained', prefix='backbone.')``
    used by the rsb recipe to load an mmcls classification checkpoint
    into a detector backbone (fasa_iof_base10_..._1x_rsb.py)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model", "state_dict"):
            if key in ckpt:
                ckpt = ckpt[key]
                break
    ckpt = {k.replace("module.", ""): v for k, v in ckpt.items()}
    if prefix and any(k.startswith(prefix) for k in ckpt):
        ckpt = {k[len(prefix):]: v for k, v in ckpt.items()
                if k.startswith(prefix)}
    return convert_torch_resnet(ckpt, num_classes)


def merge_pretrained(variables: Dict, params: Dict, batch_stats: Dict
                     ) -> Dict:
    """Overlay converted weights onto freshly-initialized variables
    (missing keys — e.g. a swapped classifier — keep their init)."""
    import jax

    def _merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict) and k in out:
                out[k] = _merge(out[k], v)
            else:
                out[k] = jax.numpy.asarray(v)
        return out

    new = dict(variables)
    new["params"] = _merge(variables["params"], params)
    if batch_stats:
        new["batch_stats"] = _merge(variables.get("batch_stats", {}),
                                    batch_stats)
    return new
