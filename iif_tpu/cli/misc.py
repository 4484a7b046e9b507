"""Misc tools: ``print_config`` and ``browse_dataset``.

TPU-native parity for the reference's ``tools/misc/print_config.py``
(resolve a config with ``_base_`` inheritance + ``--cfg-options`` and
print the merged text) and ``tools/misc/browse_dataset.py`` (run the
train data pipeline and render the transformed images with their GT
boxes/masks so the augmentation recipe can be eyeballed).

Usage:
  python -m iif_tpu.cli.misc print_config CONFIG [--cfg-options k=v ...]
  python -m iif_tpu.cli.misc browse_dataset CONFIG --output-dir /tmp/vis \
      [--number 20] [--no-aug]
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def _load_cfg(args):
    from iif_tpu.config import Config, parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options))
    return cfg


def cmd_print_config(args) -> None:
    cfg = _load_cfg(args)
    print(f"Config:\n{cfg.pretty_text()}")


def cmd_browse_dataset(args) -> None:
    """Render pipeline outputs (reference browse_dataset.py: retrieves the
    pipeline-transformed item and draws gt_bboxes with imshow_det_bboxes;
    it strips the format/normalize steps — our pipeline already emits a
    drawable uint8 canvas, so no stripping is needed)."""
    import cv2

    from iif_tpu.detection.datasets import DATASETS
    from iif_tpu.detection.pipeline import (DetectionPipeline,
                                            build_extra_transforms)

    cfg = _load_cfg(args)
    dcfg = cfg.data
    ds = DATASETS.build({k: v for k, v in dcfg["train"].items()
                         if k != "oversample_thr"})
    pcfg = cfg.get("pipeline", {})
    extras = [] if args.no_aug else build_extra_transforms(
        pcfg.get("extras", []))
    pipeline = DetectionPipeline(
        canvas=tuple(pcfg.get("canvas", (800, 1344))),
        scales=[tuple(s) for s in pcfg.get("scales", [(1333, 800)])],
        flip_prob=0.0 if args.no_aug else pcfg.get("flip_prob", 0.5),
        max_gt=pcfg.get("max_gt", 100),
        with_mask=cfg.model.get("with_mask", True),
        mask_stride=pcfg.get("mask_stride", 1),
        extra_transforms=extras,
        keep_ratio=pcfg.get("keep_ratio", True),
        emit_uint8=True, pack_masks=False)

    os.makedirs(args.output_dir, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    n = min(args.number, len(ds)) if args.number > 0 else len(ds)
    for i in range(n):
        img = cv2.cvtColor(cv2.imread(ds.image_path(i)), cv2.COLOR_BGR2RGB)
        sample = pipeline(img, ds.get_ann(i), rng, train=True)
        canvas = np.ascontiguousarray(sample["image"])
        colors = np.random.RandomState(42).randint(
            0, 255, (len(ds.CLASSES), 3))
        for j in np.flatnonzero(sample["gt_valid"]):
            x1, y1, x2, y2 = sample["gt_boxes"][j].astype(int)
            lab = int(sample["gt_labels"][j])
            c = tuple(int(v) for v in colors[lab])
            cv2.rectangle(canvas, (x1, y1), (x2, y2), c, 2)
            cv2.putText(canvas, ds.CLASSES[lab], (x1, max(y1 - 4, 10)),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.5, c, 1)
            if "gt_masks" in sample:
                ms = pcfg.get("mask_stride", 1)
                m = sample["gt_masks"][j].astype(bool)
                if ms > 1:
                    m = np.repeat(np.repeat(m, ms, 0), ms, 1)
                m = m[:canvas.shape[0], :canvas.shape[1]]
                canvas[m] = (0.5 * canvas[m] + 0.5 * np.asarray(c)).astype(
                    canvas.dtype)
        base = os.path.basename(ds.image_path(i))
        out = os.path.join(args.output_dir, base)
        cv2.imwrite(out, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
        print(f"[{i + 1}/{n}] {out}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("print_config",
                       help="resolve _base_/--cfg-options and print")
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="*", default=[])
    p.set_defaults(fn=cmd_print_config)

    b = sub.add_parser("browse_dataset",
                       help="render augmented train samples with GT")
    b.add_argument("config")
    b.add_argument("--output-dir", required=True)
    b.add_argument("--number", type=int, default=20,
                   help="how many images (0 = all)")
    b.add_argument("--no-aug", action="store_true",
                   help="disable flip/extra transforms (reference "
                        "--skip-type analog)")
    b.add_argument("--seed", type=int, default=0)
    b.add_argument("--cfg-options", nargs="*", default=[])
    b.set_defaults(fn=cmd_browse_dataset)

    args = ap.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
