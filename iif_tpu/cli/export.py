"""Model export CLI — the TPU-native analog of the reference's
deployment path (``tools/deployment/pytorch2onnx.py`` +
``mmdet/core/export/``): serialize the jitted inference function to
portable **StableHLO** via ``jax.export`` instead of ONNX/TensorRT
(XLA consumes StableHLO directly on TPU/GPU/CPU; versioned and
forward-compatible, the role ONNX plays for torch).

Usage::

    python -m iif_tpu.cli.export CONFIG [--checkpoint CKPT_DIR] \
        --out model.stablehlo [--batch-size 1] [--print-mlir]

The exported artifact contains the whole detector inference program
(backbone -> ... -> NMS -> fixed-shape detection slates) plus the
weights as constants; reload with :func:`load_exported` and call with a
uint8/float canvas batch.
"""
from __future__ import annotations

import argparse
from typing import Any, Callable, Tuple


def parse_args():
    p = argparse.ArgumentParser(description="Export a detector to StableHLO")
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--out", default="model.stablehlo")
    p.add_argument("--batch-size", default=1, type=int)
    p.add_argument("--fuse-conv-bn", action="store_true")
    p.add_argument("--print-mlir", action="store_true",
                   help="also print the first lines of the MLIR module")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def build_export(config, checkpoint=None, batch_size: int = 1,
                 fuse: bool = False) -> Tuple[Any, Callable, Tuple]:
    """Returns (jax.export.Exported, the underlying callable, example
    args). Library entry so tests / notebooks can export without the
    CLI."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from iif_tpu.config import Config
    from iif_tpu.detection import build_detector
    from iif_tpu.detection.losses import DetCrossEntropyLoss

    cfg = config if not isinstance(config, str) else Config.fromfile(config)
    mcfg = dict(cfg.model)
    mcfg.pop("pretrained_backbone", None)
    model, _, test_cfg_cls = build_detector(mcfg)
    test_cfg = test_cfg_cls(**cfg.get("test_cfg", {}))
    loss_cls = DetCrossEntropyLoss(num_classes=cfg.model["num_classes"])
    canvas = tuple(cfg.get("pipeline", {}).get("canvas", (800, 1344)))

    from iif_tpu.detection.detr import DETR

    if isinstance(model, DETR):
        # DETR's __call__ is (images, img_shape, train)
        variables = jax.jit(model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), jnp.zeros((1,) + canvas + (3,)),
            jnp.asarray([[canvas[0], canvas[1]]], jnp.int32), False)
    else:
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), jnp.zeros((1,) + canvas + (3,)), False)
    if checkpoint:
        from iif_tpu.utils.checkpoint import CheckpointManager

        restored = CheckpointManager(checkpoint).restore()
        variables = {"params": restored["state"]["params"],
                     "batch_stats": restored["state"]["batch_stats"]}
    if fuse:
        from iif_tpu.models.fuse import fuse_conv_bn

        variables, _ = fuse_conv_bn(variables)

    from iif_tpu.detection.simple_test import make_simple_test

    fn, needs_shape = make_simple_test(model, loss_cls, test_cfg)
    if needs_shape:
        # DETR-style: the valid-region shape is a runtime input of the
        # artifact (NOT baked to the full canvas — keep-ratio resize
        # means the valid region differs per image)
        def infer(img, img_shape):
            return fn(variables, img, img_shape)

        example = (jnp.zeros((batch_size,) + canvas + (3,), jnp.float32),
                   jnp.tile(jnp.asarray([[canvas[0], canvas[1]]],
                                        jnp.int32), (batch_size, 1)))
    else:
        def infer(img):
            return fn(variables, img)

        example = (jnp.zeros((batch_size,) + canvas + (3,), jnp.float32),)
    exported = jexport.export(jax.jit(infer))(*example)
    return exported, infer, example


def load_exported(path: str):
    """Deserialize a .stablehlo artifact; returns an object whose
    ``.call(images)`` runs the detector."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def main():
    args = parse_args()
    from iif_tpu.config import Config, parse_cfg_options

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options))
    exported, _, example = build_export(
        cfg, args.checkpoint, args.batch_size, args.fuse_conv_bn)
    data = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"exported {args.config} -> {args.out} "
          f"({len(data) / 1e6:.1f} MB, input {example[0].shape})")
    if args.print_mlir:
        print(exported.mlir_module()[:2000])


if __name__ == "__main__":
    main()
