"""Analysis tools CLI — rebuild of ``tools/analysis_tools/``
(benchmark.py inference-FPS with warmup, get_flops.py, analyze_logs.py).

Usage::

    python -m iif_tpu.cli.analysis benchmark CONFIG CKPT [--num-iters 50]
    python -m iif_tpu.cli.analysis flops CONFIG [--shape 800 1344]
    python -m iif_tpu.cli.analysis logs PATH.log.json [--key time]
"""
from __future__ import annotations

import argparse
import time


def main():
    from iif_tpu.utils.compile_cache import enable as _enable_xla_cache
    _enable_xla_cache()

    p = argparse.ArgumentParser(description="analysis tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("benchmark")
    b.add_argument("config")
    b.add_argument("checkpoint", nargs="?", default=None)
    b.add_argument("--num-iters", default=50, type=int)
    b.add_argument("--warmup", default=5, type=int)
    b.add_argument("--batch-size", default=1, type=int)
    b.add_argument("--fuse-conv-bn", action="store_true",
                   help="fold frozen BN into convs before timing")

    f = sub.add_parser("flops")
    f.add_argument("config")
    f.add_argument("--shape", nargs=2, type=int, default=[800, 1344])

    l = sub.add_parser("logs")
    l.add_argument("path", nargs="+",
                   help=".log.json file(s); several overlay in one plot")
    l.add_argument("--key", default="time",
                   help="speed-stats field (cal_train_time mode)")
    l.add_argument("--plot-keys", nargs="+", default=None,
                   help="plot these metrics instead of printing speed "
                        "stats (analyze_logs.py plot_curve: losses/lr "
                        "over iters, *AP*/acc over epochs)")
    l.add_argument("--legend", nargs="+", default=None)
    l.add_argument("--title", default=None)
    l.add_argument("--out", default=None, help="figure path (png/pdf)")

    e = sub.add_parser("eval_metric",
                       help="offline eval of a dumped results json "
                            "(tools/analysis_tools/eval_metric.py)")
    e.add_argument("config")
    e.add_argument("results", help="results json from test_det --out")
    e.add_argument("--eval", nargs="+", default=["bbox"])

    ea = sub.add_parser("coco_error_analysis",
                        help="per-category error decomposition "
                             "(tools/analysis_tools/coco_error_analysis.py)")
    ea.add_argument("config")
    ea.add_argument("results")
    ea.add_argument("--eval", default="bbox", choices=["bbox", "segm"])
    ea.add_argument("--topk", default=20, type=int,
                    help="print the K worst categories")

    rb = sub.add_parser("test_robustness",
                        help="corruption-robustness benchmark: AP per "
                             "(corruption, severity) + mPC/rPC "
                             "(tools/analysis_tools/test_robustness.py)")
    rb.add_argument("config")
    rb.add_argument("checkpoint")
    rb.add_argument("--corruptions", nargs="+", default=["benchmark"],
                    help="names or a set: benchmark/noise/blur/weather/"
                         "digital/holdout")
    rb.add_argument("--severities", nargs="+", type=int,
                    default=[0, 1, 2, 3, 4, 5])
    rb.add_argument("--eval", nargs="+", default=["bbox"])
    rb.add_argument("--max-images", default=None, type=int)

    ar = sub.add_parser("analyze_results",
                        help="rank images by per-image mAP; optionally "
                             "render the best/worst K "
                             "(tools/analysis_tools/analyze_results.py)")
    ar.add_argument("config")
    ar.add_argument("results")
    ar.add_argument("--topk", default=20, type=int)
    ar.add_argument("--show-dir", default=None,
                    help="write good/<score>_<img> and bad/... renderings")
    ar.add_argument("--show-score-thr", default=0.3, type=float)

    oa = sub.add_parser("optimize_anchors",
                        help="k-means IoU anchor search over the train "
                             "set (tools/analysis_tools/optimize_anchors.py)")
    oa.add_argument("config")
    oa.add_argument("--num-anchors", default=3, type=int,
                    help="anchors per FPN level (RPN ratios count)")
    oa.add_argument("--iters", default=50, type=int)

    args = p.parse_args()
    if args.cmd in ("eval_metric", "coco_error_analysis"):
        _offline_eval(args)
        return
    if args.cmd == "analyze_results":
        _analyze_results(args)
        return
    if args.cmd == "test_robustness":
        _test_robustness(args)
        return
    if args.cmd == "optimize_anchors":
        _optimize_anchors(args)
        return
    if args.cmd == "logs":
        from iif_tpu.utils.profiling import (analyze_log_json,
                                             plot_log_curves)

        if args.plot_keys:
            plot_log_curves(args.path, args.plot_keys,
                            legend=args.legend, title=args.title,
                            out=args.out)
        else:
            for path in args.path:
                print(path, analyze_log_json(path, args.key))
        return

    import jax
    import jax.numpy as jnp

    from iif_tpu.config import Config
    from iif_tpu.detection import build_detector
    from iif_tpu.detection.losses import DetCrossEntropyLoss

    cfg = Config.fromfile(args.config)
    mcfg = dict(cfg.model)
    mcfg.pop("pretrained_backbone", None)
    model, _, test_cfg_cls = build_detector(mcfg)
    canvas = tuple(cfg.get("pipeline", {}).get("canvas", (800, 1344)))
    loss_cls = DetCrossEntropyLoss(num_classes=cfg.model["num_classes"])

    if args.cmd == "flops":
        from iif_tpu.detection.simple_test import init_detector_variables
        from iif_tpu.utils.profiling import flops_of

        variables = init_detector_variables(model, canvas)
        fl = flops_of(
            lambda v, x: model.apply(v, x, False,
                                     method=type(model).extract_feat),
            variables, jnp.zeros((1,) + canvas + (3,)))
        print(f"backbone+FPN flops for input {canvas}: {fl / 1e9:.2f} GFLOPs")
        return

    # benchmark: pure-inference FPS (reference benchmark.py:52-120)
    from iif_tpu.detection.simple_test import init_detector_variables

    variables = init_detector_variables(model, canvas)
    if args.checkpoint:
        from iif_tpu.utils.checkpoint import CheckpointManager

        restored = CheckpointManager(args.checkpoint).restore()
        variables = {"params": restored["state"]["params"],
                     "batch_stats": restored["state"]["batch_stats"]}
    if getattr(args, "fuse_conv_bn", False):
        from iif_tpu.models.fuse import fuse_conv_bn

        variables, n_fused = fuse_conv_bn(variables)
        print(f"fuse-conv-bn: folded {n_fused} conv/BN pairs")
    test_cfg = test_cfg_cls(**cfg.get("test_cfg", {}))
    x = jnp.zeros((args.batch_size,) + canvas + (3,))

    # NOTE: block_until_ready is unreliable on tunneled TPU backends; a
    # host readback of a value depending on the outputs is the only
    # honest sync. Chain iterations through the input so they serialize.
    from iif_tpu.detection.simple_test import make_simple_test

    st_fn, needs_ishape = make_simple_test(model, loss_cls, test_cfg)

    def _one_iter(v, img):
        if needs_ishape:
            ishape = jnp.tile(jnp.asarray([[canvas[0], canvas[1]]],
                                          jnp.int32), (img.shape[0], 1))
            out = st_fn(v, img, ishape)
        else:
            out = st_fn(v, img)
        return out, out["scores"].sum()

    run = jax.jit(_one_iter)
    out, chk = run(variables, x)
    _ = float(chk)
    for _ in range(args.warmup - 1):
        out, chk = run(variables, x)
    _ = float(chk)
    t0 = time.perf_counter()
    for _ in range(args.num_iters):
        out, chk = run(variables, x + chk * 0)  # serialize on prev result
    _ = float(chk)
    dt = time.perf_counter() - t0
    fps = args.batch_size * args.num_iters / dt
    print(f"Overall fps: {fps:.2f} img/s ({dt / args.num_iters * 1e3:.1f} "
          f"ms/iter, batch {args.batch_size})")


def _build_test_evaluator(args):
    import json

    from iif_tpu.config import Config
    from iif_tpu.detection.datasets import DATASETS
    from iif_tpu.detection.evaluation import DetEvaluator

    cfg = Config.fromfile(args.config)
    ds = DATASETS.build({k: v for k, v in cfg.data["test"].items()
                         if k != "oversample_thr"})
    with open(args.results) as f:
        results = json.load(f)
    gt_anns = [a for rec in ds.img_infos for a in rec["anns"]]
    ev = DetEvaluator(ds.img_infos, gt_anns, ds.cat_ids,
                      lvis=ds.lvis_style,
                      cat_image_counts=ds.cat_image_counts,
                      cat_frequency=getattr(ds, "cat_frequency", None),
                      max_dets=cfg.get("test_cfg", {}).get(
                          "max_per_img", 100))
    return cfg, ds, ev, results


def _offline_eval(args):
    cfg, ds, ev, results = _build_test_evaluator(args)
    if args.cmd == "eval_metric":
        for metric in args.eval:
            res = ev.evaluate(results,
                              "segm" if metric == "segm" else "bbox")
            print(metric, {k: round(v, 4) for k, v in res.items()})
        return
    out = ev.error_analysis(results, args.eval)
    m = out["mean"]
    print("mean error decomposition ({}):".format(args.eval))
    print(f"  C75 {m['C75']:.3f} | C50 {m['C50']:.3f} | "
          f"Loc {m['Loc']:.3f} | BG {m['BG']:.3f} | FN 1.000")
    print(f"  -> loc err {m['Loc'] - m['C50']:.3f}, bg-FP err "
          f"{m['BG'] - m['Loc']:.3f}, FN err {1.0 - m['BG']:.3f}")
    names = {cid: n for cid, n in zip(ds.cat_ids, ds.CLASSES)}
    worst = sorted(out["per_category"].items(),
                   key=lambda kv: kv[1]["C50"])[:args.topk]
    print(f"worst {len(worst)} categories by C50:")
    for cid, r in worst:
        print(f"  {names.get(cid, cid):>30}: C75 {r['C75']:.3f} "
              f"C50 {r['C50']:.3f} Loc {r['Loc']:.3f} BG {r['BG']:.3f}")


def _test_robustness(args):
    """Reference ``test_robustness.py`` + ``robustness_eval.py``: run the
    eval split under each (corruption, severity), report AP per cell,
    clean performance P (severity 0), mean/relative performance under
    corruption mPC = mean(AP[sev>=1]) and rPC = mPC / P."""
    import functools

    import numpy as np

    from iif_tpu.cli.test_det import _EvalLoader, run_inference
    from iif_tpu.cli.train_det import build_loss_cls
    from iif_tpu.config import Config
    from iif_tpu.detection.corruptions import CORRUPTION_SETS, corrupt
    from iif_tpu.detection.datasets import DATASETS
    from iif_tpu.detection.detector import (DetTestCfg, MaskRCNN,
                                            model_kwargs_from_cfg)
    from iif_tpu.detection.evaluation import DetEvaluator
    from iif_tpu.detection.pipeline import DetectionPipeline
    from iif_tpu.utils.checkpoint import CheckpointManager

    cfg = Config.fromfile(args.config)
    names = []
    for c in args.corruptions:
        names.extend(CORRUPTION_SETS.get(c, [c]))
    test_ds = DATASETS.build({k: v for k, v in cfg.data["test"].items()
                              if k != "oversample_thr"})
    pcfg = cfg.get("pipeline", {})
    pipeline = DetectionPipeline(
        canvas=tuple(pcfg.get("canvas", (800, 1344))),
        scales=[tuple(s) for s in pcfg.get("scales", [(1333, 800)])],
        flip_prob=0.0, max_gt=1, emit_uint8=pcfg.get("uint8", True),
        with_mask=cfg.model.get("with_mask", True),
        keep_ratio=pcfg.get("keep_ratio", True))
    num_classes = cfg.model["num_classes"]
    loss_cls = build_loss_cls(cfg.loss_cls, test_ds, num_classes)
    cfg.model.pop("pretrained_backbone", None)
    if cfg.loss_cls.get("type") == "SeesawLoss":
        cfg.model.setdefault("cls_channels", num_classes + 2)
    model_kw = model_kwargs_from_cfg(cfg.model)
    if cfg.model.get("type", "MaskRCNN") == "CascadeMaskRCNN":
        from iif_tpu.detection.cascade import CascadeMaskRCNN

        model = CascadeMaskRCNN(**model_kw)
    else:
        model = MaskRCNN(**model_kw)
    restored = CheckpointManager(args.checkpoint).restore()
    variables = {"params": restored["state"]["params"],
                 "batch_stats": restored["state"]["batch_stats"]}
    test_cfg = DetTestCfg(**cfg.get("test_cfg", {}))
    gt_anns = [a for rec in test_ds.img_infos for a in rec["anns"]]
    ev = DetEvaluator(test_ds.img_infos, gt_anns, test_ds.cat_ids,
                      lvis=test_ds.lvis_style,
                      cat_image_counts=test_ds.cat_image_counts,
                      cat_frequency=getattr(test_ds, "cat_frequency", None),
                      max_dets=cfg.get("test_cfg", {}).get(
                          "max_per_img", 100))

    def _ap(corr_hook):
        loader = _EvalLoader(test_ds, pipeline,
                             cfg.data.get("samples_per_gpu", 4),
                             corrupt=corr_hook)
        results = run_inference(
            model, variables, loader, loss_cls, test_cfg, test_ds.cat_ids,
            cfg.model.get("with_mask", True), max_images=args.max_images)
        return {m: ev.evaluate(results,
                               "segm" if m == "segm" else "bbox")["AP"]
                for m in args.eval}

    sev = sorted(set(args.severities))
    table = {}        # corruption -> severity -> {metric: AP}
    clean = _ap(None) if 0 in sev else None
    for name in names:
        table[name] = {}
        if clean is not None:
            table[name][0] = clean
        for s in sev:
            if s == 0:
                continue
            table[name][s] = _ap(functools.partial(corrupt, name=name,
                                                   severity=s))
        row = " ".join(f"s{si}={table[name][si][args.eval[0]]:.3f}"
                       for si in sorted(table[name]))
        print(f"{name}: {row}", flush=True)

    for m in args.eval:
        vals = np.asarray([[table[n][s][m] for s in sev if s > 0]
                           for n in names])
        mpc = float(vals.mean()) if vals.size else float("nan")
        print(f"[{m}] P (clean) = "
              f"{clean[m] if clean else float('nan'):.4f}")
        print(f"[{m}] mPC = {mpc:.4f}")
        if clean and clean[m] > 0:
            print(f"[{m}] rPC = {mpc / clean[m]:.4f}")


def _analyze_results(args):
    """Reference ``analyze_results.py``: score every image by its own
    single-image VOC mAP (iou 0.5), list/render the best and worst K."""
    import os

    import numpy as np

    from iif_tpu.detection.voc_eval import eval_map

    cfg, ds, ev, results = _build_test_evaluator(args)
    ncls = len(ds.cat_ids)
    cat2label = {cid: i for i, cid in enumerate(ds.cat_ids)}
    by_img = {}
    for r in results:
        by_img.setdefault(r["image_id"], []).append(r)

    scores = []
    for idx, rec in enumerate(ds.img_infos):
        dets = [np.zeros((0, 5), np.float32) for _ in range(ncls)]
        per_cls = {}
        for r in by_img.get(rec["id"], []):
            c = cat2label.get(r["category_id"])
            if c is None:
                continue
            x, y, w, h = r["bbox"]
            per_cls.setdefault(c, []).append(
                [x, y, x + w, y + h, r["score"]])
        for c, rows in per_cls.items():
            dets[c] = np.asarray(rows, np.float32)
        gtb, gtl = [], []
        for a in rec["anns"]:
            if a.get("iscrowd"):
                continue
            x, y, w, h = a["bbox"]
            gtb.append([x, y, x + w, y + h])
            gtl.append(cat2label.get(a["category_id"], -1))
        ann = {"bboxes": np.asarray(gtb, np.float32).reshape(-1, 4),
               "labels": np.asarray(gtl, np.int64)}
        mAP, _ = eval_map([dets], [ann], iou_thr=0.5)
        scores.append((mAP, idx, dets))

    ranked = sorted(scores, key=lambda t: t[0])
    k = min(args.topk, len(ranked))
    print(f"worst {k} images by single-image mAP@0.5:")
    for mAP, idx, _ in ranked[:k]:
        print(f"  {ds.img_infos[idx]['file_name']}: {mAP:.3f}")
    print(f"best {k} images:")
    for mAP, idx, _ in ranked[-k:][::-1]:
        print(f"  {ds.img_infos[idx]['file_name']}: {mAP:.3f}")

    if args.show_dir:
        from iif_tpu.detection.inference import show_result

        for sub_name, chunk in (("bad", ranked[:k]),
                                ("good", ranked[-k:][::-1])):
            os.makedirs(os.path.join(args.show_dir, sub_name),
                        exist_ok=True)
            for mAP, idx, dets in chunk:
                rows = np.concatenate(
                    [np.concatenate([d, np.full((len(d), 1), c)], 1)
                     for c, d in enumerate(dets) if len(d)] or
                    [np.zeros((0, 6), np.float32)])
                res = {"boxes": rows[:, :4], "scores": rows[:, 4],
                       "labels": rows[:, 5].astype(np.int64),
                       "valid": np.ones(len(rows), bool)}
                out = os.path.join(
                    args.show_dir, sub_name,
                    f"{mAP:.3f}_"
                    + os.path.basename(ds.img_infos[idx]["file_name"]))
                show_result(ds.image_path(idx), res, classes=ds.CLASSES,
                            score_thr=args.show_score_thr, out_file=out)
        print(f"renderings in {args.show_dir}/good|bad")


def _optimize_anchors(args):
    """k-means (1 - IoU distance, centered boxes) over train-set wh at the
    train scale; prints per-level (scale, ratio) suggestions for the RPN
    anchor generator."""
    import numpy as np

    from iif_tpu.config import Config
    from iif_tpu.detection.datasets import DATASETS
    from iif_tpu.detection.pipeline import keep_ratio_scale

    cfg = Config.fromfile(args.config)
    ds = DATASETS.build({k: v for k, v in cfg.data["train"].items()
                         if k != "oversample_thr"})
    scale = tuple(cfg.get("pipeline", {}).get("scales",
                                              [(1333, 800)])[-1])
    whs = []
    for rec in ds.img_infos:
        f = keep_ratio_scale(rec["height"], rec["width"], scale)
        for a in rec["anns"]:
            w, h = a["bbox"][2] * f, a["bbox"][3] * f
            if w > 1 and h > 1:
                whs.append((w, h))
    whs = np.asarray(whs)
    print(f"{len(whs)} gt boxes at train scale {scale}")

    strides = (4, 8, 16, 32, 64)
    # cluster within each FPN level's scale band (the RPN assigns by
    # area: level l covers sqrt(area) in [56*2^(l-1), 56*2^l) roughly)
    lvl = np.clip(np.floor(np.log2(np.sqrt(whs.prod(1)) / 56.0 + 1e-6)),
                  0, 4).astype(int) + 0  # same rule as map_roi_levels
    for level, stride in enumerate(strides):
        sel = whs[lvl == level] if (lvl == level).any() else whs
        k = args.num_anchors
        # k-means with d = 1 - IoU of centered boxes
        rng = np.random.RandomState(0)
        cent = sel[rng.choice(len(sel), k, replace=False)]
        for _ in range(args.iters):
            inter = (np.minimum(sel[:, None, 0], cent[None, :, 0])
                     * np.minimum(sel[:, None, 1], cent[None, :, 1]))
            union = (sel[:, None].prod(-1) + cent[None].prod(-1) - inter)
            assign = np.argmax(inter / np.maximum(union, 1e-9), axis=1)
            cent = np.array([
                np.median(sel[assign == j], axis=0)
                if (assign == j).any() else cent[j] for j in range(k)])
        cent = cent[np.argsort(cent.prod(1))]
        print(f"level {level} (stride {stride}):")
        for w, h in cent:
            s = np.sqrt(w * h) / stride
            print(f"  wh=({w:6.1f},{h:6.1f})  scale={s:5.2f} "
                  f"ratio={h / w:4.2f}")


if __name__ == "__main__":
    main()
