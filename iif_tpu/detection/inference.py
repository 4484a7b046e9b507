"""Single-image inference API — rebuild of ``mmdet/apis/inference.py``
(``init_detector`` / ``inference_detector`` / ``async_inference_detector``
/ ``show_result_pyplot``).

Beyond the reference surface, :func:`inference_detector_pipelined`
exploits JAX's asynchronous dispatch to overlap host preprocessing and
mask pasting with device compute across a stream of images — the
TPU-native answer to the reference's async/concurrent inference path
(``mmdet/utils/contextmanagers.py``, ``tests/test_runtime/test_async.py``).
"""
from __future__ import annotations

import asyncio
from typing import Any, Dict, Iterable, List, Optional, Tuple, Union

import numpy as np


class Detector:
    """Bundles model + variables + loss/test config for repeated calls."""

    def __init__(self, model, variables, loss_cls, test_cfg, pipeline,
                 classes: List[str]):
        self.model = model
        self.variables = variables
        self.loss_cls = loss_cls
        self.test_cfg = test_cfg
        self.pipeline = pipeline
        self.CLASSES = classes
        self._run = None  # lazily-built jitted inference fn


def init_detector(config: Union[str, Any], checkpoint: Optional[str] = None,
                  fuse_conv_bn: bool = False) -> Detector:
    """Build a detector from a config path (+ optional orbax checkpoint).
    ``fuse_conv_bn`` folds frozen BN into the conv kernels at load
    (reference ``tools/test.py:45-47``)."""
    import jax
    import jax.numpy as jnp

    from iif_tpu.cli.train_det import build_loss_cls
    from iif_tpu.config import Config
    from iif_tpu.detection import build_detector
    from iif_tpu.detection.datasets import DATASETS
    from iif_tpu.detection.pipeline import DetectionPipeline

    cfg = config if not isinstance(config, str) else Config.fromfile(config)
    mcfg = dict(cfg.model)
    mcfg.pop("pretrained_backbone", None)
    model, _, test_cfg_cls = build_detector(mcfg)

    ds_cfg = {k: v for k, v in cfg.data["test"].items()
              if k != "oversample_thr"}
    try:
        test_ds = DATASETS.build(ds_cfg)
        classes = test_ds.CLASSES
        loss_cls = build_loss_cls(cfg.loss_cls, test_ds,
                                  cfg.model["num_classes"])
    except FileNotFoundError:
        from iif_tpu.detection.losses import DetCrossEntropyLoss

        classes = [str(i) for i in range(cfg.model["num_classes"])]
        loss_cls = DetCrossEntropyLoss(num_classes=cfg.model["num_classes"])

    pcfg = cfg.get("pipeline", {})
    pipeline = DetectionPipeline(
        canvas=tuple(pcfg.get("canvas", (800, 1344))),
        scales=[tuple(s) for s in pcfg.get("scales", [(1333, 800)])],
        flip_prob=0.0, max_gt=1, emit_uint8=pcfg.get("uint8", True),
        with_mask=cfg.model.get("with_mask", True),
        keep_ratio=pcfg.get("keep_ratio", True))

    from iif_tpu.detection.simple_test import init_detector_variables

    canvas = pipeline.canvas
    variables = init_detector_variables(model, canvas)
    if checkpoint and checkpoint.endswith(".pth"):
        # reference-trained mmdet checkpoint (the reference's
        # init_detector also takes a .pth): convert + overlay
        from iif_tpu.detection.pretrained_det import load_mmdet_checkpoint
        from iif_tpu.models.pretrained import merge_pretrained

        p, bs = load_mmdet_checkpoint(checkpoint, cfg.model["num_classes"])
        variables = merge_pretrained(variables, p, bs)
    elif checkpoint:
        from iif_tpu.utils.checkpoint import CheckpointManager

        restored = CheckpointManager(checkpoint).restore()
        variables = {"params": restored["state"]["params"],
                     "batch_stats": restored["state"]["batch_stats"]}
    if fuse_conv_bn:
        from iif_tpu.models.fuse import fuse_conv_bn as _fuse

        variables, _ = _fuse(variables)
    return Detector(model, variables, loss_cls,
                    test_cfg_cls(**cfg.get("test_cfg", {})), pipeline,
                    classes)


# ------------------------------------------------------------------ internals
def _ensure_run(detector: Detector) -> None:
    """Build (once) the jitted per-family simple_test dispatch."""
    import jax

    if detector._run is not None:
        return
    from iif_tpu.detection.simple_test import make_simple_test

    fn, _ = make_simple_test(detector.model, detector.loss_cls,
                             detector.test_cfg)
    detector._run = jax.jit(fn)


def _preprocess(detector: Detector, image: Union[str, np.ndarray]
                ) -> Tuple[Dict[str, np.ndarray], Tuple[int, int]]:
    """Host side: load + resize/pad one image onto the static canvas."""
    if isinstance(image, str):
        import cv2

        image = cv2.cvtColor(cv2.imread(image), cv2.COLOR_BGR2RGB)
    h, w = image.shape[:2]
    ann = {"boxes": np.zeros((0, 4), np.float32),
           "labels": np.zeros(0, np.int64), "segms": [],
           "width": w, "height": h}
    sample = detector.pipeline(image, ann, np.random.RandomState(0),
                               train=False)
    return sample, (h, w)


def _dispatch(detector: Detector, sample: Dict[str, np.ndarray]):
    """Enqueue the jitted forward (returns device arrays, non-blocking)."""
    import jax.numpy as jnp

    from iif_tpu.detection.detr import DETR

    batch_img = jnp.asarray(sample["image"][None])
    if isinstance(detector.model, DETR):
        return detector._run(detector.variables, batch_img,
                             jnp.asarray(sample["img_shape"][None]))
    return detector._run(detector.variables, batch_img)


def _postprocess(detector: Detector, sample: Dict[str, np.ndarray], out,
                 hw: Tuple[int, int], idx: int = 0,
                 with_masks: bool = True) -> Dict[str, np.ndarray]:
    """Read back + rescale to the original image frame, paste masks.
    ``idx`` selects the batch row (``out`` may be device arrays or an
    already-fetched numpy pytree — ``device_get`` passes numpy through).
    """
    import jax
    import jax.numpy as jnp

    from iif_tpu.detection.mask_head import paste_masks

    h, w = hw
    out = jax.device_get(out)
    f = np.asarray(sample["scale_factor"])   # scalar or (4,) per-axis
    boxes = np.asarray(out["boxes"][idx]) / f
    result = {
        "boxes": boxes,
        "scores": np.asarray(out["scores"][idx]),
        "labels": np.asarray(out["labels"][idx]),
        "valid": np.asarray(out["valid"][idx]),
    }
    if "masks" in out and with_masks:
        result["masks"] = np.asarray(paste_masks(
            jnp.asarray(out["masks"][idx]), jnp.asarray(boxes), (h, w),
            threshold=getattr(detector.test_cfg, "mask_thr_binary", 0.5)))
    return result


# ------------------------------------------------------------------- public
def inference_detector(detector: Detector,
                       image: Union[str, np.ndarray],
                       masks: bool = True) -> Dict[str, np.ndarray]:
    """Detect on one image (path or RGB array). Returns original-scale
    boxes/scores/labels (+ full-size boolean masks when available;
    ``masks=False`` skips the host-side full-resolution paste +
    readback — the serving path only returns boxes)."""
    _ensure_run(detector)
    sample, hw = _preprocess(detector, image)
    return _postprocess(detector, sample, _dispatch(detector, sample), hw,
                        with_masks=masks)


def inference_detector_batch(detector: Detector,
                             images: List[Union[str, np.ndarray]],
                             pad_to: Optional[int] = None,
                             masks: bool = True
                             ) -> List[Dict[str, np.ndarray]]:
    """Detect on several images in ONE device program (all canvases are
    the same static shape, so the batch rides the leading axis — the
    serving-throughput path: b4 is ~1.7x b1 img/s on a v5e).

    ``pad_to``: compile for a fixed batch size by repeating the last
    canvas (results for the padding rows are dropped) — keeps one
    compiled program across variable request bursts.
    """
    import jax
    import jax.numpy as jnp

    from iif_tpu.detection.detr import DETR

    if not images:
        return []
    _ensure_run(detector)
    pre = [_preprocess(detector, img) for img in images]
    n = len(pre)
    reps = [1] * n
    if pad_to is not None and pad_to > n:
        reps[-1] += pad_to - n
    batch_img = jnp.asarray(np.concatenate(
        [np.repeat(s["image"][None], r, axis=0)
         for (s, _), r in zip(pre, reps)], axis=0))
    if isinstance(detector.model, DETR):
        ishape = jnp.asarray(np.concatenate(
            [np.repeat(s["img_shape"][None], r, axis=0)
             for (s, _), r in zip(pre, reps)], axis=0))
        out = detector._run(detector.variables, batch_img, ishape)
    else:
        out = detector._run(detector.variables, batch_img)
    out = jax.device_get(out)
    return [_postprocess(detector, s, out, hw, idx=i, with_masks=masks)
            for i, (s, hw) in enumerate(pre)]


def inference_detector_pipelined(detector: Detector,
                                 images: Iterable[Union[str, np.ndarray]],
                                 depth: int = 2
                                 ) -> List[Dict[str, np.ndarray]]:
    """Streamed inference over many images with host/device overlap.

    JAX dispatch is asynchronous: each jitted call returns immediately
    with futures for its outputs. We keep up to ``depth`` dispatched
    steps in flight, so image ``i+1``'s JPEG decode + resize (host) and
    image ``i-1``'s readback run while the device executes image ``i``.
    Results are identical to calling :func:`inference_detector` per
    image (per-image computation is independent).
    """
    from collections import deque

    _ensure_run(detector)
    pending: deque = deque()          # (sample, hw, device_out)
    results: List[Dict[str, np.ndarray]] = []
    for image in images:
        sample, hw = _preprocess(detector, image)
        pending.append((sample, hw, _dispatch(detector, sample)))
        while len(pending) > max(1, depth):
            s, whw, o = pending.popleft()
            results.append(_postprocess(detector, s, o, whw))
    while pending:
        s, whw, o = pending.popleft()
        results.append(_postprocess(detector, s, o, whw))
    return results


async def async_inference_detector(detector: Detector,
                                   image: Union[str, np.ndarray]
                                   ) -> Dict[str, np.ndarray]:
    """Coroutine form of :func:`inference_detector` — API parity with
    ``mmdet.apis.async_inference_detector`` (``apis/inference.py``; the
    reference wraps CUDA streams, here the executor thread overlaps the
    host work while jax dispatch overlaps the device work)."""
    loop = asyncio.get_event_loop()
    return await loop.run_in_executor(
        None, inference_detector, detector, image)


def show_result(image: Union[str, np.ndarray], result: Dict[str, np.ndarray],
                classes: Optional[List[str]] = None,
                score_thr: float = 0.3,
                out_file: Optional[str] = None) -> np.ndarray:
    """Draw detections (cv2) — ``show_result_pyplot`` equivalent."""
    import cv2

    if isinstance(image, str):
        image = cv2.cvtColor(cv2.imread(image), cv2.COLOR_BGR2RGB)
    img = image.copy()
    keep = result["valid"] & (result["scores"] >= score_thr)
    rng = np.random.RandomState(42)
    colors = rng.randint(0, 255, (1 + int(result["labels"].max(initial=0)), 3))
    for i in np.flatnonzero(keep):
        x1, y1, x2, y2 = result["boxes"][i].astype(int)
        c = tuple(int(v) for v in colors[int(result["labels"][i])])
        cv2.rectangle(img, (x1, y1), (x2, y2), c, 2)
        name = (classes[int(result["labels"][i])] if classes
                else str(int(result["labels"][i])))
        cv2.putText(img, f"{name} {result['scores'][i]:.2f}",
                    (x1, max(y1 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                    c, 1)
        if "masks" in result:
            m = result["masks"][i]
            img[m] = (0.5 * img[m] + 0.5 * np.asarray(c)).astype(img.dtype)
    if out_file:
        cv2.imwrite(out_file, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return img
