"""Shared per-family inference dispatch.

Every surface that runs a detector forward (``cli/test_det.py``, the
inference API, StableHLO export, the HTTP server) needs the same
model-type -> ``*_simple_test`` routing; keeping it in one place means a
new family is wired once (the reference gets this for free from its
registry — ``mmdet/models/builder.py`` — since every detector carries
its own ``simple_test`` method)."""
from __future__ import annotations

from typing import Any, Callable, Tuple


def init_detector_variables(model, canvas, seed: int = 0):
    """Family-aware ``model.init`` on a zero canvas batch.

    DETR's ``__call__(images, img_shape, train)`` takes the per-image
    pixel shape as a second array argument; every other family is
    ``__call__(images, train)``. Centralised so the inference API, the
    analysis CLI, and ``test_det`` cannot drift from the trainer's
    dispatch (``engine/detection.py`` ``init_state``)."""
    import jax
    import jax.numpy as jnp

    from iif_tpu.detection.detr import DETR

    images = jnp.zeros((1,) + tuple(canvas) + (3,), jnp.float32)
    if isinstance(model, DETR):
        ishape = jnp.asarray([[canvas[0], canvas[1]]], jnp.int32)
        return jax.jit(model.init, static_argnums=(3,))(
            jax.random.PRNGKey(seed), images, ishape, False)
    return jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(seed), images, False)


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
    if not getattr(model, "with_rpn", True):
        # FastRCNN: precomputed proposals ride alongside the image; the
        # returned fn is marked so callers feed batch['proposals']
        def _fast(v, img, proposals, proposals_valid):
            return maskrcnn_simple_test(
                model, v, img, loss_cls, test_cfg,
                proposals=proposals, proposals_valid=proposals_valid)

        _fast.needs_proposals = True
        return _fast, False
    return (lambda v, img: maskrcnn_simple_test(
        model, v, img, loss_cls, test_cfg)), False
