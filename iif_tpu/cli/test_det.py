"""Detection eval CLI — rebuild of ``instance_segmentation/tools/test.py``:
load a checkpoint, run inference over the val split, compute
bbox/segm AP (COCO or LVIS protocol), optionally dump results json
(``--format-only``).
"""
from __future__ import annotations

import argparse
import json
import os
from typing import List, Optional

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint", help="checkpoint dir (orbax)")
    p.add_argument("--eval", nargs="+", default=["bbox"],
                   help="metrics: bbox segm proposal_fast mAP PQ "
                        "(PQ needs a PanopticFPN model + "
                        "CocoPanopticDataset)")
    p.add_argument("--format-only", action="store_true")
    p.add_argument("--out", default=None, help="results json path")
    p.add_argument("--max-images", default=None, type=int)
    p.add_argument("--show-dir", default=None,
                   help="draw detections onto images in this dir")
    p.add_argument("--show-score-thr", default=0.3, type=float)
    p.add_argument("--cfg-options", nargs="+", default=[])
    p.add_argument("--tta", action="store_true",
                   help="multi-scale+flip aug-test (reference aug_test: "
                        "merged proposals re-scored per view)")
    p.add_argument("--exported", default=None,
                   help="evaluate a serialized .stablehlo artifact "
                        "(python -m iif_tpu.cli.export) instead of the "
                        "checkpoint — the reference's "
                        "tools/deployment/test.py; the artifact embeds "
                        "the weights and fixes the batch size")
    p.add_argument("--fuse-conv-bn", action="store_true",
                   help="fold frozen BN into conv kernels at load "
                        "(reference tools/test.py:45-47)")
    return p.parse_args()


def run_inference(model, variables, loader, loss_cls, test_cfg, cat_ids,
                  with_mask: bool, max_images=None,
                  pan_out: Optional[list] = None,
                  pan_cfg: Optional[dict] = None,
                  exported=None) -> List[dict]:
    """``pan_out``: pass a list to ALSO collect fused panoptic maps
    ({image_id, pan}) when the model is a PanopticFPN — the reference's
    panoptic simple_test + heuristic fusion path.

    ``exported``: a deserialized ``jax.export`` artifact; when given the
    detection program is the artifact itself (weights embedded) — the
    deployment-eval path (reference ``tools/deployment/test.py``)."""
    import jax

    from iif_tpu.detection.evaluation import detections_to_coco_results
    from iif_tpu.detection.mask_utils import rle_encode
    from iif_tpu.detection.mask_head import paste_masks
    from iif_tpu.detection.simple_test import make_simple_test

    if exported is not None:
        import jax.numpy as jnp

        want = tuple(exported.in_avals[0].shape)
        needs_shape = len(exported.in_avals) > 1   # DETR exports carry it

        def run(v, img, ishape=None):
            # the artifact was traced on float input, so the uint8
            # canvas normalization happens here (normalize_if_uint8
            # is identity for float inside the exported program)
            from iif_tpu.detection.detector import normalize_if_uint8

            img = jnp.asarray(img)
            img = (normalize_if_uint8(img) if img.dtype == jnp.uint8
                   else img.astype(jnp.float32))
            if tuple(img.shape) != want:
                raise ValueError(
                    f"exported artifact expects input {want}, "
                    f"loader produced {tuple(img.shape)} — re-export "
                    f"with --batch-size {img.shape[0]} or set "
                    f"data.samples_per_gpu={want[0]}")
            if needs_shape:
                return exported.call(img, jnp.asarray(ishape, jnp.int32))
            return exported.call(img)
    else:
        base, needs_shape = make_simple_test(model, loss_cls, test_cfg)
        from iif_tpu.detection.panoptic import PanopticFPN

        if pan_out is not None and isinstance(model, PanopticFPN):
            # panoptic simple_test: detections + stuff logits in one
            # program (XLA CSEs the shared backbone/FPN)
            def _pan_test(v, img):
                det = dict(base(v, img))
                det["seg_logits"] = model.apply(
                    v, img, method=lambda m, im: m.semantic_head(
                        m.extract_feat(im, train=False)))
                return det

            run = jax.jit(_pan_test)
        else:
            run = jax.jit(base)

    needs_props = exported is None and getattr(base, "needs_proposals",
                                               False)
    results: List[dict] = []
    n_done = 0
    for batch in loader:
        if needs_props:
            if "proposals" not in batch:
                raise SystemExit(
                    "FastRCNN eval needs precomputed proposals: set "
                    "data.test.proposal_file (pickle of per-image (n,4|5) "
                    "arrays) in the config")
            out = jax.device_get(run(variables, batch["image"],
                                     batch["proposals"],
                                     batch["proposals_valid"]))
        elif needs_shape:
            out = jax.device_get(run(variables, batch["image"],
                                     batch["img_shape"]))
        else:
            out = jax.device_get(run(variables, batch["image"]))
        # undo the resize: boxes back to original image coords. Scalar
        # (keep-ratio) or (4,) [fx, fy, fx, fy] (keep_ratio=False / SSD)
        sf = np.asarray(batch["scale_factor"])
        sf = sf[:, None, None] if sf.ndim == 1 else sf[:, None, :]
        boxes = np.asarray(out["boxes"]) / sf
        masks_rle = None
        if with_mask and "masks" in out:
            masks_rle = []
            for b in range(boxes.shape[0]):
                per_img = []
                h, w = int(batch["orig_shape"][b][0]), \
                    int(batch["orig_shape"][b][1])
                import jax.numpy as jnp

                pasted = np.asarray(paste_masks(
                    jnp.asarray(out["masks"][b]), jnp.asarray(boxes[b]),
                    (h, w),
                    threshold=getattr(test_cfg, "mask_thr_binary", 0.5)))
                for k in range(pasted.shape[0]):
                    per_img.append(rle_encode(pasted[k].astype(np.uint8)))
                masks_rle.append(per_img)
                if pan_out is not None and "seg_logits" in out:
                    from iif_tpu.detection.panoptic import heuristic_fuse

                    nh, nw = (int(batch["img_shape"][b][0]),
                              int(batch["img_shape"][b][1]))
                    seg = np.asarray(out["seg_logits"][b])
                    stride = (batch["image"].shape[1]
                              + seg.shape[0] - 1) // seg.shape[0]
                    seg = seg[:(nh + stride - 1) // stride,
                              :(nw + stride - 1) // stride]
                    pan = heuristic_fuse(
                        boxes[b], np.asarray(out["scores"][b]),
                        np.asarray(out["labels"][b]),
                        np.asarray(out["valid"][b]), pasted, seg,
                        num_things=model.num_classes,
                        **(pan_cfg or {}))
                    pan_out.append({"image_id": int(batch["image_ids"][b]),
                                    "pan": pan})
        results.extend(detections_to_coco_results(
            batch["image_ids"], boxes, np.asarray(out["scores"]),
            np.asarray(out["labels"]), np.asarray(out["valid"]), cat_ids,
            masks=masks_rle,
            mask_scores=(np.asarray(out["mask_scores"])
                         if "mask_scores" in out else None)))
        n_done += boxes.shape[0]
        if max_images and n_done >= max_images:
            break
    return results


def run_inference_tta(model, variables, dataset, pipeline, views, loss_cls,
                      test_cfg, cat_ids, with_mask: bool, max_images=None,
                      num_shards: int = 1, shard_id: int = 0) -> List[dict]:
    """Aug-test over `views` ({scale, flip} grid): one jitted program per
    image with the view axis as the batch axis (detection/tta.py)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from iif_tpu.detection.cascade import CascadeMaskRCNN
    from iif_tpu.detection.evaluation import detections_to_coco_results
    from iif_tpu.detection.mask_head import paste_masks
    from iif_tpu.detection.mask_utils import rle_encode
    from iif_tpu.detection.tta import cascade_aug_test, maskrcnn_aug_test

    if isinstance(model, CascadeMaskRCNN):
        run = jax.jit(lambda v, im, sf, fl, chw: cascade_aug_test(
            model, v, im, sf, fl, chw, [loss_cls] * model.num_stages,
            test_cfg))
    else:
        run = jax.jit(lambda v, im, sf, fl, chw: maskrcnn_aug_test(
            model, v, im, sf, fl, chw, loss_cls, test_cfg))

    results: List[dict] = []
    indices = list(range(shard_id, len(dataset), num_shards))
    if max_images:
        indices = indices[:max_images]
    for i in indices:
        img = cv2.cvtColor(cv2.imread(dataset.image_path(i)),
                           cv2.COLOR_BGR2RGB)
        samples = [pipeline.eval_view(img, v["scale"], v["flip"])
                   for v in views]
        ims = jnp.stack([s["image"] for s in samples])
        sfs = jnp.asarray([s["scale_factor"] for s in samples])
        fls = jnp.asarray([bool(s["flip"]) for s in samples])
        chw = jnp.asarray([s["img_shape"] for s in samples], jnp.float32)
        out = jax.device_get(run(variables, ims, sfs, fls, chw))
        boxes = np.asarray(out["boxes"])[None]
        ann = dataset.get_ann(i)
        masks_rle = None
        if with_mask and "masks" in out:
            pasted = np.asarray(paste_masks(
                jnp.asarray(out["masks"]), jnp.asarray(boxes[0]),
                (ann["height"], ann["width"]),
                threshold=getattr(test_cfg, "mask_thr_binary", 0.5)))
            masks_rle = [[rle_encode(pasted[k].astype(np.uint8))
                          for k in range(pasted.shape[0])]]
        results.extend(detections_to_coco_results(
            np.asarray([dataset.img_infos[i]["id"]]), boxes,
            np.asarray(out["scores"])[None], np.asarray(out["labels"])[None],
            np.asarray(out["valid"])[None], cat_ids, masks=masks_rle))
    return results


def main():
    from iif_tpu.utils.compile_cache import enable as _enable_xla_cache
    _enable_xla_cache()

    import jax

    from iif_tpu.config import Config, parse_cfg_options
    from iif_tpu.cli.train_det import build_loss_cls
    from iif_tpu.detection.datasets import DATASETS
    from iif_tpu.detection.evaluation import DetEvaluator
    from iif_tpu.detection.pipeline import DetectionLoader, DetectionPipeline
    from iif_tpu.utils.checkpoint import CheckpointManager

    args = parse_args()
    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options))

    # multi-host eval (scripts/dist_test.sh / slurm_test.sh): must come
    # before the first jax.process_count()/process_index() call so each
    # host evaluates only its shard (reference multi_gpu_test,
    # mmdet/apis/test.py:70)
    from iif_tpu.parallel import initialize_distributed
    initialize_distributed()

    test_ds = DATASETS.build({k: v for k, v in cfg.data["test"].items()
                              if k != "oversample_thr"})
    pcfg = cfg.get("pipeline", {})
    pipeline = DetectionPipeline(
        canvas=tuple(pcfg.get("canvas", (800, 1344))),
        scales=[tuple(s) for s in pcfg.get("scales", [(1333, 800)])],
        flip_prob=0.0, max_gt=1, emit_uint8=pcfg.get("uint8", True),
        with_mask=cfg.model.get("with_mask", True),
        keep_ratio=pcfg.get("keep_ratio", True),
        max_proposals=pcfg.get(
            "max_proposals",
            512 if not cfg.model.get("with_rpn", True) else 0))
    loader = _EvalLoader(test_ds, pipeline,
                         cfg.data.get("samples_per_gpu", 4),
                         num_shards=jax.process_count(),
                         shard_id=jax.process_index())

    num_classes = cfg.model["num_classes"]
    loss_cls = build_loss_cls(cfg.loss_cls, test_ds, num_classes)
    from iif_tpu.detection import build_detector

    cfg.model.pop("pretrained_backbone", None)   # train-time only
    if cfg.loss_cls.get("type") == "SeesawLoss":
        cfg.model.setdefault("cls_channels", num_classes + 2)
    if cfg.model.get("cls_predictor") == "iif_normed":
        cfg.model["iif_weights"] = tuple(
            float(x) for x in np.asarray(loss_cls.weights))
    model, _, test_cfg_cls = build_detector(cfg.model)

    exported = None
    if args.exported:
        # deployment artifact eval: weights live inside the program, so
        # no checkpoint restore (pass '-' as the checkpoint arg)
        from iif_tpu.cli.export import load_exported

        exported = load_exported(args.exported)
        variables = None
    elif args.checkpoint.endswith(".pth"):
        # reference-trained mmdet checkpoint: convert + overlay
        from iif_tpu.detection.pretrained_det import load_mmdet_checkpoint
        from iif_tpu.models.pretrained import merge_pretrained

        from iif_tpu.detection.simple_test import init_detector_variables

        init_vars = init_detector_variables(
            model, tuple(pcfg.get("canvas", (800, 1344))))
        p, bs = load_mmdet_checkpoint(args.checkpoint, num_classes)
        variables = merge_pretrained(init_vars, p, bs)
    else:
        mngr = CheckpointManager(args.checkpoint)
        restored = mngr.restore()
        variables = {"params": restored["state"]["params"],
                     "batch_stats": restored["state"]["batch_stats"]}
    if args.fuse_conv_bn and variables is not None:
        from iif_tpu.models.fuse import fuse_conv_bn

        variables, n_fused = fuse_conv_bn(variables)
        print(f"fuse-conv-bn: folded {n_fused} conv/BN pairs")
    test_cfg = test_cfg_cls(**cfg.get("test_cfg", {}))

    pan_results = None
    if args.tta and args.exported:
        raise SystemExit("--tta and --exported are mutually exclusive "
                         "(the artifact is a fixed single-view program)")
    if args.tta and any(m.lower() == "pq" for m in args.eval):
        raise SystemExit("--eval PQ is not supported with --tta (the "
                         "panoptic fusion runs on the single-view path "
                         "only); drop --tta for PQ")
    if args.tta:
        from iif_tpu.detection.tta import multi_scale_flip_views

        tta_cfg = cfg.get("tta", {})
        views = multi_scale_flip_views(
            [tuple(s) for s in tta_cfg.get(
                "scales", pcfg.get("scales", [(1333, 800)])[-1:])],
            flip=tta_cfg.get("flip", True))
        results = run_inference_tta(
            model, variables, test_ds, pipeline, views, loss_cls, test_cfg,
            test_ds.cat_ids, cfg.model.get("with_mask", True),
            max_images=args.max_images, num_shards=jax.process_count(),
            shard_id=jax.process_index())
    else:
        if any(m.lower() == "pq" for m in args.eval):
            pan_results = []
        results = run_inference(model, variables, loader, loss_cls, test_cfg,
                                test_ds.cat_ids,
                                cfg.model.get("with_mask", True),
                                max_images=args.max_images,
                                pan_out=pan_results,
                                pan_cfg=cfg.get("panoptic", None),
                                exported=exported)
    # multi-host: merge per-host result lists; rank 0 evaluates/dumps
    # (reference collect_results_cpu, apis/test.py:118-191)
    from iif_tpu.parallel import gather_objects, is_main_process

    if jax.process_count() > 1:
        parts = gather_objects((results, pan_results))
        if not is_main_process():
            return
        results = [r for part in parts for r in part[0]]
        if pan_results is not None:
            pan_results = [r for part in parts for r in (part[1] or [])]
    if args.out or args.format_only:
        out = args.out or "results.json"
        with open(out, "w") as f:
            json.dump(results, f)
        print(f"wrote {len(results)} detections to {out}")
        if args.format_only:
            return

    if args.show_dir:
        _draw_results(args, test_ds, results)

    coco_metrics = [m for m in args.eval if m.lower() != "pq"]
    if pan_results is not None:
        # panoptic quality over the fused maps (reference
        # CocoPanopticDataset.evaluate -> panopticapi pq_compute)
        res = test_ds.evaluate(pan_results)
        print("PQ", {k: round(v, 4) for k, v in res.items()})
        if not coco_metrics:
            return
    gt_anns = [a for rec in test_ds.img_infos for a in rec["anns"]]
    ev = DetEvaluator(test_ds.img_infos, gt_anns, test_ds.cat_ids,
                      lvis=test_ds.lvis_style,
                      cat_image_counts=test_ds.cat_image_counts,
                      cat_frequency=getattr(test_ds, "cat_frequency", None),
                      max_dets=cfg.get("test_cfg", {}).get("max_per_img", 100))
    for metric in coco_metrics:
        if metric == "proposal_fast":
            # mmdet CocoDataset.evaluate 'proposal_fast': class-agnostic
            # AR@k from the dumped detections vs GT (fast_eval_recall)
            from iif_tpu.detection.voc_eval import eval_recalls

            by_img = {}
            for r in results:
                x, y, w, h = r["bbox"]
                by_img.setdefault(r["image_id"], []).append(
                    [x, y, x + w, y + h, r["score"]])
            gts, props = [], []
            for rec in test_ds.img_infos:
                gts.append(np.asarray(
                    [[a["bbox"][0], a["bbox"][1],
                      a["bbox"][0] + a["bbox"][2],
                      a["bbox"][1] + a["bbox"][3]]
                     for a in rec["anns"] if not a.get("iscrowd")],
                    np.float32).reshape(-1, 4))
                p = np.asarray(by_img.get(rec["id"], []),
                               np.float32).reshape(-1, 5)
                props.append(p[np.argsort(-p[:, 4])] if len(p) else p)
            nums = (100, 300, 1000)
            thrs = np.arange(0.5, 0.96, 0.05)
            rec_mat = eval_recalls(gts, props, nums, thrs)
            ar = rec_mat.mean(axis=1)
            print("proposal_fast",
                  {f"AR@{n}": round(float(a), 4)
                   for n, a in zip(nums, ar)})
            continue
        if metric == "mAP":
            # VOC protocol (reference VOCDataset.evaluate, voc.py:28-86:
            # eval_map at IoU 0.5, '11points' for VOC2007 / 'area' else)
            from iif_tpu.detection.voc_eval import eval_map

            num_classes = len(test_ds.CLASSES)
            id2idx = {rec["id"]: i for i, rec in
                      enumerate(test_ds.img_infos)}
            det_results = [[np.zeros((0, 5), np.float32)
                            for _ in range(num_classes)]
                           for _ in test_ds.img_infos]
            for r in results:
                i = id2idx.get(r["image_id"])
                if i is None:
                    continue
                x, y, bw, bh = r["bbox"]
                c = test_ds.cat2label[r["category_id"]]
                det_results[i][c] = np.concatenate(
                    [det_results[i][c],
                     [[x, y, x + bw, y + bh, r["score"]]]]).astype(
                    np.float32)
            annotations = []
            for idx in range(len(test_ds.img_infos)):
                ann = test_ds.get_ann(idx)
                # VOC 'difficult' objects land in crowd_boxes (the VOC
                # loader gives them crowd semantics) and must enter
                # eval_map as ignore regions, not be dropped — otherwise
                # hits on difficult objects count as FPs
                annotations.append({"bboxes": ann["boxes"],
                                    "labels": ann["labels"],
                                    "bboxes_ignore": ann.get(
                                        "crowd_boxes",
                                        np.zeros((0, 4), np.float32)),
                                    "labels_ignore": ann.get(
                                        "crowd_labels")})
            mode = ("11points" if "VOC2007" in
                    getattr(test_ds, "img_prefix", "") else "area")
            m, per_cls = eval_map(det_results, annotations,
                                  iou_thr=0.5, mode=mode)
            print("mAP", round(m, 4),
                  {test_ds.CLASSES[c]: round(r["ap"], 4)
                   for c, r in enumerate(per_cls)})
            continue
        res = ev.evaluate(results, "segm" if metric == "segm" else "bbox")
        print(metric, {k: round(v, 4) for k, v in res.items()})


def _draw_results(args, test_ds, results):
    """--show-dir: render detections per image (reference tools/test.py
    --show-dir via show_result)."""
    import os
    from collections import defaultdict

    from iif_tpu.detection.inference import show_result

    os.makedirs(args.show_dir, exist_ok=True)
    by_img = defaultdict(list)
    for r in results:
        by_img[r["image_id"]].append(r)
    id2idx = {rec["id"]: i for i, rec in enumerate(test_ds.img_infos)}
    for iid, recs in by_img.items():
        idx = id2idx.get(iid)
        if idx is None:
            continue
        res = {
            "boxes": np.array([[r["bbox"][0], r["bbox"][1],
                                r["bbox"][0] + r["bbox"][2],
                                r["bbox"][1] + r["bbox"][3]] for r in recs]),
            "scores": np.array([r["score"] for r in recs]),
            "labels": np.array([test_ds.cat_ids.index(r["category_id"])
                                for r in recs]),
            "valid": np.ones(len(recs), bool),
        }
        show_result(test_ds.image_path(idx), res, classes=test_ds.CLASSES,
                    score_thr=args.show_score_thr,
                    out_file=os.path.join(args.show_dir, f"{iid}.jpg"))


class _EvalLoader:
    """Sequential eval batches carrying image ids + original shapes.

    ``num_shards``/``shard_id`` stride the dataset across hosts (the
    reference's DistributedSampler over the test set); per-host result
    lists are merged back with ``gather_objects`` (``apis/test.py``
    collect_results)."""

    def __init__(self, dataset, pipeline, batch_size, num_shards: int = 1,
                 shard_id: int = 0, corrupt=None):
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = batch_size
        self.indices = list(range(shard_id, len(dataset), num_shards))
        # optional image -> image hook (robustness benchmarking: the
        # reference inserts a Corrupt pipeline step, test_robustness.py)
        self.corrupt = corrupt

    def __iter__(self):
        import cv2

        rng = np.random.RandomState(0)
        n = len(self.indices)
        for b0 in range(0, n, self.batch_size):
            idxs = self.indices[b0:b0 + self.batch_size]
            samples, ids, shapes = [], [], []
            for i in idxs:
                img = cv2.cvtColor(cv2.imread(self.dataset.image_path(i)),
                                   cv2.COLOR_BGR2RGB)
                if self.corrupt is not None:
                    img = self.corrupt(img, seed=i)
                ann = self.dataset.get_ann(i)
                props = (self.dataset.get_proposals(i)
                         if self.pipeline.max_proposals > 0
                         and getattr(self.dataset, "with_proposals", False)
                         else None)
                samples.append(self.pipeline(img, ann, rng, train=False,
                                             proposals=props))
                ids.append(self.dataset.img_infos[i]["id"])
                shapes.append([ann["height"], ann["width"]])
            while len(samples) < self.batch_size:  # pad last batch
                samples.append(samples[-1])
                ids.append(-1)
                shapes.append(shapes[-1])
            batch = {k: np.stack([s[k] for s in samples])
                     for k in samples[0]}
            batch["image_ids"] = np.asarray(ids)
            batch["orig_shape"] = np.asarray(shapes)
            yield batch


if __name__ == "__main__":
    main()
