"""Shared per-family inference dispatch.

Every surface that runs a detector forward (``cli/test_det.py``, the
inference API, StableHLO export, the HTTP server) needs the same
model-type -> ``*_simple_test`` routing; keeping it in one place means a
new family is wired once (the reference gets this for free from its
registry — ``mmdet/models/builder.py`` — since every detector carries
its own ``simple_test`` method)."""
from __future__ import annotations

from typing import Any, Callable, Tuple


def make_simple_test(model, loss_cls, test_cfg
                     ) -> Tuple[Callable, bool]:
    """Return ``(fn, needs_img_shape)``.

    ``fn(variables, images)`` — or ``fn(variables, images, img_shape)``
    when ``needs_img_shape`` — runs the family's simple_test and returns
    the fixed-shape detection dict (boxes/scores/labels/valid [+masks]).
    Not jitted; callers wrap in ``jax.jit`` / ``jax.export``.
    """
    from iif_tpu.detection.c4 import C4FasterRCNN, c4_simple_test
    from iif_tpu.detection.cascade import CascadeMaskRCNN, cascade_simple_test
    from iif_tpu.detection.cascade_rpn import (
        CascadeRPN,
        cascade_rpn_simple_test,
    )
    from iif_tpu.detection.detector import maskrcnn_simple_test
    from iif_tpu.detection.detr import DETR, detr_simple_test
    from iif_tpu.detection.htc import HTC, htc_simple_test
    from iif_tpu.detection.rpn_detector import (
        RPNDetector,
        rpn_only_simple_test,
    )
    from iif_tpu.detection.scnet import SCNet, scnet_simple_test
    from iif_tpu.detection.single_stage import (
        _SingleStageBase,
        single_stage_simple_test,
    )
    from iif_tpu.detection.trident import (
        TridentFasterRCNN,
        trident_simple_test,
    )

    if isinstance(model, DETR):
        return (lambda v, img, ishape: detr_simple_test(
            model, v, img, test_cfg, img_shape=ishape,
            max_per_img=test_cfg.max_per_img)), True
    if isinstance(model, _SingleStageBase):
        return (lambda v, img: single_stage_simple_test(
            model, v, img, test_cfg)), False
    if isinstance(model, HTC):          # before the CascadeMaskRCNN base
        return (lambda v, img: htc_simple_test(
            model, v, img, [loss_cls] * model.num_stages, test_cfg)), False
    if isinstance(model, SCNet):
        return (lambda v, img: scnet_simple_test(
            model, v, img, [loss_cls] * model.num_stages, test_cfg)), False
    if isinstance(model, CascadeMaskRCNN):
        return (lambda v, img: cascade_simple_test(
            model, v, img, [loss_cls] * model.num_stages, test_cfg)), False
    if isinstance(model, TridentFasterRCNN):
        return (lambda v, img: trident_simple_test(
            model, v, img, loss_cls, test_cfg)), False
    if isinstance(model, C4FasterRCNN):
        return (lambda v, img: c4_simple_test(
            model, v, img, loss_cls, test_cfg)), False
    if isinstance(model, CascadeRPN):
        return (lambda v, img: cascade_rpn_simple_test(
            model, v, img, test_cfg)), False
    if isinstance(model, RPNDetector):
        return (lambda v, img: rpn_only_simple_test(
            model, v, img, test_cfg)), False
    return (lambda v, img: maskrcnn_simple_test(
        model, v, img, loss_cls, test_cfg)), False
