"""Model-zoo checkpoint converters — the TPU-native rebuild of the
reference's ``tools/model_converters/`` family:

    publish      release-weights export with sha256 content naming
                 (``tools/model_converters/publish_model.py``)
    detectron    detectron/caffe2 ResNet pickle -> torchvision-style
                 state dict ingestible by ``--pretrained`` / backbone
                 overlays (``detectron2pytorch.py``)
    regnet       pycls RegNet checkpoint -> mmdet-style names
                 (``regnet2mmdet.py``)
    selfsup      MoCo/SwAV self-supervised checkpoints -> plain backbone
                 state dict (``selfsup2mmdet.py``)
    upgrade      legacy mmdet(<2.5 / <0.5.3) detector checkpoints ->
                 modern class ordering so ``load_mmdet_checkpoint`` can
                 ingest them (``upgrade_model_version.py``)
    upgrade-ssd  legacy SSD checkpoints -> modern key layout
                 (``upgrade_ssd_version.py``)

All converters emit formats the in-repo loaders consume directly:
``detectron``/``regnet``/``selfsup``/``upgrade*`` write a ``.pth`` with a
``state_dict`` entry (``iif_tpu.models.pretrained.load_torch_checkpoint``
/ ``iif_tpu.detection.pretrained_det.load_mmdet_checkpoint`` read it);
``publish`` writes the framework's own ``.npz`` weights. The channel
reorder/truncate math is numpy, differential-tested against the lifted
torch reference transforms in ``tests/oracles/convert_oracle.py``.

Usage: ``python -m iif_tpu.cli.convert_model <subcommand> ...``
"""
from __future__ import annotations

import argparse
import pickle
import re
from collections import OrderedDict
from typing import Dict, List, Optional

import numpy as np

RESNET_ARCH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


# -------------------------------------------------------- detectron/caffe2
def convert_detectron_resnet(blobs: Dict[str, np.ndarray], depth: int
                             ) -> "OrderedDict[str, np.ndarray]":
    """detectron/caffe2 ResNet blob names -> torchvision-style names
    (reference ``detectron2pytorch.py:35-72``).

    Detectron replaces BN with AffineChannel (scale ``*_s`` + bias
    ``*_b`` only); the converted BN gets zero running mean and unit
    running variance, matching the reference converter exactly.
    """
    if depth not in RESNET_ARCH:
        raise ValueError("only ResNet-50/101 detectron conversions are "
                         f"defined (got depth={depth})")
    state: "OrderedDict[str, np.ndarray]" = OrderedDict()
    converted = set()

    def conv(caffe, torch_name):
        state[torch_name + ".weight"] = np.asarray(blobs[caffe + "_w"])
        converted.add(caffe + "_w")
        if caffe + "_b" in blobs:
            state[torch_name + ".bias"] = np.asarray(blobs[caffe + "_b"])
            converted.add(caffe + "_b")

    def bn(caffe, torch_name):
        scale = np.asarray(blobs[caffe + "_s"])
        state[torch_name + ".weight"] = scale
        state[torch_name + ".bias"] = np.asarray(blobs[caffe + "_b"])
        state[torch_name + ".running_mean"] = np.zeros_like(scale)
        state[torch_name + ".running_var"] = np.ones_like(scale)
        converted.update({caffe + "_s", caffe + "_b"})

    conv("conv1", "conv1")
    bn("res_conv1_bn", "bn1")
    for i, n_blocks in enumerate(RESNET_ARCH[depth], start=1):
        for j in range(n_blocks):
            if j == 0:
                conv(f"res{i + 1}_{j}_branch1",
                     f"layer{i}.{j}.downsample.0")
                bn(f"res{i + 1}_{j}_branch1_bn",
                   f"layer{i}.{j}.downsample.1")
            for k, letter in enumerate("abc"):
                conv(f"res{i + 1}_{j}_branch2{letter}",
                     f"layer{i}.{j}.conv{k + 1}")
                bn(f"res{i + 1}_{j}_branch2{letter}_bn",
                   f"layer{i}.{j}.bn{k + 1}")
    leftover = [k for k in blobs if k not in converted]
    for key in leftover:
        print(f"not converted: {key}")
    return state


# -------------------------------------------------------------- pycls RegNet
def convert_pycls_regnet(blobs: Dict[str, np.ndarray]
                         ) -> "OrderedDict[str, np.ndarray]":
    """pycls RegNet ``model_state`` names -> mmdet/torchvision-style
    names (reference ``regnet2mmdet.py:8-53``): ``stem.conv->conv1``,
    ``sX.bY.f.{a,b,c}[_bn]->layerX.(Y-1).conv/bn{1,2,3}``, block-1
    ``proj/bn`` -> ``downsample.{0,1}``, ``head.fc->fc``."""
    state: "OrderedDict[str, np.ndarray]" = OrderedDict()
    sub = {"a": "conv1", "b": "conv2", "c": "conv3",
           "a_bn": "bn1", "b_bn": "bn2", "c_bn": "bn3"}
    for key, w in blobs.items():
        w = np.asarray(w)
        if "stem" in key:
            new = key.replace("stem.conv", "conv1").replace("stem.bn", "bn1")
        elif "head" in key:
            new = key.replace("head.fc", "fc")
        elif key.startswith("s"):
            parts = key.split(".")
            layer, block, module = parts[:3]
            lname = f"layer{int(layer[1:])}"
            bname = str(int(block[1:]) - 1)
            leaf = parts[-1]
            if int(block[1:]) == 1 and module == "bn":
                new = f"{lname}.{bname}.downsample.1.{leaf}"
            elif int(block[1:]) == 1 and module == "proj":
                new = f"{lname}.{bname}.downsample.0.{leaf}"
            elif module == "f":
                new = f"{lname}.{bname}.{sub[parts[3]]}.{leaf}"
            else:
                raise ValueError(f"unsupported pycls key {key}")
        else:
            print(f"not converted: {key}")
            continue
        state[new] = w
    return state


# --------------------------------------------------------------- selfsup
def convert_selfsup(state_dict: Dict[str, np.ndarray], kind: str
                    ) -> "OrderedDict[str, np.ndarray]":
    """MoCo: keep+strip the ``module.encoder_q.`` prefix (reference
    ``selfsup2mmdet.py:8-25``); SwAV checkpoints already use plain
    backbone names — only the DDP ``module.`` prefix is stripped."""
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    if kind == "moco":
        for k, v in state_dict.items():
            if k.startswith("module.encoder_q."):
                out[k[len("module.encoder_q."):]] = np.asarray(v)
    elif kind == "swav":
        for k, v in state_dict.items():
            out[k[len("module."):] if k.startswith("module.") else k] = \
                np.asarray(v)
    else:
        raise ValueError(f"unknown selfsup kind {kind!r}")
    return out


# ------------------------------------------------- legacy-version upgrades
def reorder_cls_channel(val: np.ndarray, num_classes: int) -> np.ndarray:
    """bg-first (mmdet 1.x) -> bg-last class ordering (reference
    ``upgrade_model_version.py:46-67``)."""
    if val.ndim == 1:
        return np.concatenate([val[1:], val[:1]], axis=0)
    out_ch, in_ch = val.shape[:2]
    if out_ch != num_classes and out_ch % num_classes == 0:
        new = val.reshape(-1, num_classes, in_ch, *val.shape[2:])
        new = np.concatenate([new[:, 1:], new[:, :1]], axis=1)
        return new.reshape(val.shape)
    if out_ch == num_classes:
        return np.concatenate([val[1:], val[:1]], axis=0)
    return val


def truncate_cls_channel(val: np.ndarray, num_classes: int) -> np.ndarray:
    """Drop the bg mask channel (reference ``:70-88``)."""
    if val.ndim == 1:
        return val[:num_classes - 1] if val.shape[0] % num_classes == 0 \
            else val
    out_ch = val.shape[0]
    if out_ch % num_classes == 0:
        new = val.reshape(num_classes, val.shape[1], *val.shape[2:])[1:]
        return new.reshape(-1, *val.shape[1:])
    return val


def truncate_reg_channel(val: np.ndarray, num_classes: int) -> np.ndarray:
    """Drop the bg regression deltas (reference ``:90-112``)."""
    if val.ndim == 1:
        if val.shape[0] % num_classes == 0:
            return val.reshape(num_classes, -1)[:num_classes - 1].reshape(-1)
        return val
    out_ch, in_ch = val.shape[:2]
    if out_ch % num_classes == 0:
        new = val.reshape(num_classes, -1, in_ch, *val.shape[2:])[1:]
        return new.reshape(-1, *val.shape[1:])
    return val


_HEAD_PREFIXES = ("bbox_head", "mask_head", "semantic_head", "grid_head",
                  "mask_iou_head")


def _version_tuple(v: str) -> tuple:
    """'2.10.0rc1' -> (2, 10, 0). Numeric comparison — the reference
    compares version STRINGS ('2.10.0' < '2.5.0' lexicographically),
    which would wrongly re-apply the rpn upgrade to mmdet>=2.10
    checkpoints; we diverge deliberately."""
    parts = []
    for p in v.split(".")[:3]:
        digits = re.match(r"\d+", p)
        parts.append(int(digits.group()) if digits else 0)
    while len(parts) < 3:
        parts.append(0)
    return tuple(parts)


def parse_legacy_config(config_str: str) -> Dict[str, bool]:
    """Extract the four routing facts the reference pulls out of the
    embedded config (``upgrade_model_version.py:19-43``) with regexes
    instead of executing the config."""
    is_two_stage = re.search(r"\brpn_head\s*=", config_str) is not None
    is_ssd = is_retina = reg_cls_agnostic = False
    if not is_two_stage:
        is_ssd = re.search(r"type\s*=\s*['\"]SSDHead['\"]",
                           config_str) is not None
        is_retina = re.search(r"type\s*=\s*['\"]RetinaHead['\"]",
                              config_str) is not None
    elif re.search(r"\bbbox_head\s*=\s*\[", config_str):
        reg_cls_agnostic = True       # cascade: list of bbox heads
    elif re.search(r"reg_class_agnostic\s*=\s*True", config_str):
        reg_cls_agnostic = True
    return dict(is_two_stage=is_two_stage, is_ssd=is_ssd,
                is_retina=is_retina, reg_cls_agnostic=reg_cls_agnostic)


def upgrade_state_dict(state_dict: Dict[str, np.ndarray], num_classes: int,
                       *, is_two_stage: bool, is_ssd: bool, is_retina: bool,
                       reg_cls_agnostic: bool, upgrade_rpn: bool,
                       upgrade_retina: bool
                       ) -> "OrderedDict[str, np.ndarray]":
    """Key/channel upgrade of a legacy mmdet state dict (reference
    ``upgrade_model_version.py:115-190``): heads move under
    ``roi_head.``, cls channels reorder bg-first->bg-last, per-class reg
    and mask channels drop the bg slot, legacy RetinaNet convs gain the
    ConvModule ``conv.`` segment, SSD cls convs reorder."""
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    cls_pat = (r"(conv_cls|retina_cls|rpn_cls|fc_cls|fcos_cls|fovea_cls)"
               r"\.(weight|bias)" if upgrade_rpn else
               r"(conv_cls|retina_cls|fc_cls|fcos_cls|fovea_cls)"
               r"\.(weight|bias)")
    reg_pat = (r"(fc_reg)\.(weight|bias)" if upgrade_rpn
               else r"(fc_reg|rpn_reg)\.(weight|bias)")
    for key, val in state_dict.items():
        val = np.asarray(val)
        new_key, new_val = key, val
        if is_two_stage and any(key.startswith(h) for h in _HEAD_PREFIXES):
            new_key = f"roi_head.{key}"
        if re.search(cls_pat, new_key):
            new_val = reorder_cls_channel(val, num_classes)
        if re.search(reg_pat, new_key) and not reg_cls_agnostic:
            new_val = truncate_reg_channel(val, num_classes)
        if re.search(r"(conv_logits)\.(weight|bias)", new_key):
            new_val = truncate_cls_channel(val, num_classes)
        m = re.search(r"(cls_convs|reg_convs)\.\d\.(weight|bias)", key)
        if m is not None and upgrade_retina:
            out[key.replace(m.group(2), f"conv.{m.group(2)}")] = val
            continue
        if re.search(r"(cls_convs)\.\d\.(weight|bias)", key) and is_ssd:
            new_val = reorder_cls_channel(val, num_classes)
        out[new_key] = new_val
    return out


def upgrade_ssd_state_dict(state_dict: Dict[str, np.ndarray]
                           ) -> "OrderedDict[str, np.ndarray]":
    """Legacy SSD key layout -> modern (reference
    ``upgrade_ssd_version.py:22-45``): VGG ``extra`` convs move under
    ``neck.extra_layers``, ``l2_norm`` under the neck, and the bbox-head
    conv lists gain the per-level ``.0`` segment."""
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for key, value in state_dict.items():
        if "extra" in key:
            idx = int(key.split(".")[2])
            new = (f"neck.extra_layers.{idx // 2}.{idx % 2}.conv."
                   + key.split(".")[-1])
        elif "l2_norm" in key:
            new = "neck.l2_norm.weight"
        elif "bbox_head" in key:
            new = key[:21] + ".0" + key[21:]
        else:
            new = key
        out[new] = np.asarray(value)
    return out


# ------------------------------------------------------------------ I/O
def _load_any(path: str) -> Dict:
    """Load a torch ``.pth`` or a caffe2/detectron pickle."""
    try:
        import torch

        return torch.load(path, map_location="cpu", weights_only=False)
    except Exception:
        with open(path, "rb") as f:
            return pickle.load(f, encoding="latin1")


def _to_numpy_dict(d: Dict) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in d.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _save_pth(state: Dict[str, np.ndarray], path: str,
              meta: Optional[Dict] = None) -> None:
    import torch

    ckpt = {"state_dict": OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v)))
        for k, v in state.items())}
    if meta is not None:
        ckpt["meta"] = meta
    torch.save(ckpt, path)


# ------------------------------------------------------------------- CLI
def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(
        description="Checkpoint-zoo converters "
                    "(tools/model_converters parity)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("publish", help="release-weights export "
                                       "(publish_model.py)")
    p.add_argument("ckpt_dir", help="training checkpoint directory")
    p.add_argument("out_dir")
    p.add_argument("--prefix", default="model")

    p = sub.add_parser("detectron", help="detectron/caffe2 ResNet pickle "
                                         "-> .pth (detectron2pytorch.py)")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("depth", type=int, choices=(50, 101))

    p = sub.add_parser("regnet", help="pycls RegNet -> .pth "
                                      "(regnet2mmdet.py)")
    p.add_argument("src")
    p.add_argument("dst")

    p = sub.add_parser("selfsup", help="MoCo/SwAV -> backbone .pth "
                                       "(selfsup2mmdet.py)")
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--selfsup", choices=("moco", "swav"), required=True)

    p = sub.add_parser("upgrade", help="legacy mmdet ckpt -> modern "
                                       "(upgrade_model_version.py)")
    p.add_argument("in_file")
    p.add_argument("out_file")
    p.add_argument("--num-classes", type=int, default=81,
                   help="class count INCLUDING background (legacy style)")

    p = sub.add_parser("upgrade-ssd", help="legacy SSD ckpt -> modern "
                                           "(upgrade_ssd_version.py)")
    p.add_argument("in_file")
    p.add_argument("out_file")

    args = parser.parse_args(argv)

    if args.cmd == "publish":
        from iif_tpu.utils.checkpoint import load_weights, store_model_weights

        state = load_weights(args.ckpt_dir)
        out = store_model_weights(state, args.out_dir, prefix=args.prefix)
        print(out)
        return

    if args.cmd == "detectron":
        ckpt = _load_any(args.src)
        blobs = ckpt.get("blobs", ckpt)
        _save_pth(convert_detectron_resnet(_to_numpy_dict(blobs),
                                           args.depth), args.dst)
    elif args.cmd == "regnet":
        ckpt = _load_any(args.src)
        _save_pth(convert_pycls_regnet(
            _to_numpy_dict(ckpt["model_state"])), args.dst)
    elif args.cmd == "selfsup":
        ckpt = _load_any(args.src)
        sd = ckpt.get("state_dict", ckpt)
        _save_pth(convert_selfsup(_to_numpy_dict(sd), args.selfsup),
                  args.dst)
    elif args.cmd == "upgrade":
        ckpt = _load_any(args.in_file)
        meta = ckpt.get("meta", {})
        facts = parse_legacy_config(meta.get("config", ""))
        version = _version_tuple(meta.get("mmdet_version", "0.0.0"))
        new_sd = upgrade_state_dict(
            _to_numpy_dict(ckpt["state_dict"]), args.num_classes,
            upgrade_rpn=version < (2, 5, 0),
            upgrade_retina=version <= (0, 5, 3) and facts["is_retina"],
            **facts)
        _save_pth(new_sd, args.out_file, meta=meta)
    elif args.cmd == "upgrade-ssd":
        ckpt = _load_any(args.in_file)
        _save_pth(upgrade_ssd_state_dict(_to_numpy_dict(ckpt["state_dict"])),
                  args.out_file, meta=ckpt.get("meta"))
    print(f"wrote {getattr(args, 'dst', None) or args.out_file}")


if __name__ == "__main__":
    main()
