"""Per-op roofline evidence for the LVIS b8 train step (VERDICT round-4
item 6): capture a real device trace of the exact bench.py step with
jax.profiler, parse the XPlane proto, and print the per-HLO-category
decomposition — device time, HBM bytes, achieved HBM bandwidth vs the
chip's peak, and achieved FLOP/s where the op carries a flops stat.

Usage (real TPU): python scripts/profile_roofline.py [--iters 3]
Writes the summary markdown to --out (default /tmp/roofline.md) and
prints it.

Parsing note: tensorboard_plugin_profile's converter is broken against
this TF build, so we read the raw XSpace proto
(tensorflow.tsl.profiler.protobuf.xplane_pb2) directly; run with
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python if the C++ descriptor
pool rejects the generated module.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture_trace(iters: int, trace_dir: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
    from iif_tpu.detection.losses import DetIIFLoss
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel import make_mesh, shard_batch

    B, H, W, C, G = 8, 800, 1344, 1203, 100
    mesh = make_mesh()
    cfg = DetTrainCfg(rpn_nms_pre=2000, mask_gt_stride=2, roi_ext="ml")
    model = MaskRCNN(num_classes=C, depth=50, compute_dtype=jnp.bfloat16)
    loss_cls = DetIIFLoss(weights=jnp.asarray(
        np.log(100170.0 / np.linspace(64, 2000, C)).astype(np.float32)
        .tolist() + [1.0]))
    trainer = DetectionTrainer(model, loss_cls, optax.sgd(0.001,
                                                          momentum=0.9),
                               mesh, cfg)
    state = trainer.init_state((H, W, 3))
    rng = np.random.RandomState(0)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_boxes[..., 0] = rng.uniform(0, W - 100, (B, G))
    gt_boxes[..., 1] = rng.uniform(0, H - 100, (B, G))
    gt_boxes[..., 2] = gt_boxes[..., 0] + rng.uniform(20, 100, (B, G))
    gt_boxes[..., 3] = gt_boxes[..., 1] + rng.uniform(20, 100, (B, G))
    gbatch = shard_batch({
        "image": rng.randint(0, 256, (B, H, W, 3), np.uint8),
        "gt_boxes": gt_boxes,
        "gt_labels": rng.randint(0, C, (B, G)).astype(np.int32),
        "gt_valid": (rng.rand(B, G) < 0.3),
        "gt_masks_packed": np.packbits(
            (rng.rand(B, G, H // 2, W // 2) < 0.1).astype(np.uint8),
            axis=-1),
    }, mesh)

    for _ in range(3):
        state, metrics = trainer._train_step(state, gbatch,
                                             fasa_aug_on=False)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            state, metrics = trainer._train_step(state, gbatch,
                                                 fasa_aug_on=False)
        _ = float(metrics["loss"])
    wall_ms = (time.perf_counter() - t0) / iters * 1000
    return wall_ms


def parse_xplane(trace_dir: str, iters: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    sp = xplane_pb2.XSpace()
    sp.ParseFromString(open(files[-1], "rb").read())
    dev = next(p for p in sp.planes if "/device:TPU" in p.name)
    stat_names = {k: v.name for k, v in dev.stat_metadata.items()}
    ev_meta = {k: v for k, v in dev.event_metadata.items()}
    peak_hbm_gbs = None
    peak_tflops = None
    for s in dev.stats:
        n = stat_names.get(s.metadata_id, "")
        if n == "peak_hbm_bw_gigabytes_per_second":
            peak_hbm_gbs = s.double_value
        if n == "peak_teraflops_per_second":
            peak_tflops = s.double_value

    ops_line = next(l for l in dev.lines if l.name == "XLA Ops")
    per_cat = defaultdict(lambda: dict(ps=0, bytes=0, flops=0.0, n=0))
    per_op = defaultdict(lambda: dict(ps=0, bytes=0, flops=0.0, n=0))
    total_ps = 0
    for ev in ops_line.events:
        md = ev_meta.get(ev.metadata_id)
        name = md.name if md else "?"
        cat, raw_bytes, flops = "?", 0, 0.0
        stats = list(ev.stats) + (list(md.stats) if md else [])
        for s in stats:
            n = stat_names.get(s.metadata_id, "")
            if n == "hlo_category":
                cat = s.str_value or stat_names.get(s.ref_value, "?")
            elif n == "raw_bytes_accessed":
                raw_bytes = s.int64_value or s.uint64_value
            elif n in ("raw_flops", "flops"):
                flops = float(s.int64_value or s.uint64_value
                              or s.double_value)
        dur = ev.duration_ps
        total_ps += dur
        for agg, key in ((per_cat, cat), (per_op, f"{cat}:{name}")):
            agg[key]["ps"] += dur
            agg[key]["bytes"] += raw_bytes
            agg[key]["flops"] += flops
            agg[key]["n"] += 1
    return (per_cat, per_op, total_ps, peak_hbm_gbs, peak_tflops)


def render(per_cat, per_op, total_ps, peak_hbm, peak_tflops, wall_ms,
           iters):
    lines = []
    step_ms = total_ps / 1e9 / iters
    lines.append(f"peak HBM BW {peak_hbm:.0f} GB/s, peak "
                 f"{peak_tflops:.0f} TFLOP/s (from the device trace)")
    lines.append(f"device busy {step_ms:.1f} ms/step over {iters} steps "
                 f"(wall {wall_ms:.1f} ms incl. dispatch)\n")
    lines.append("| HLO category | ms/step | GB/step | achieved GB/s "
                 "| % peak BW | TFLOP/s |")
    lines.append("|---|---|---|---|---|---|")
    for cat, d in sorted(per_cat.items(), key=lambda kv: -kv[1]["ps"]):
        ms = d["ps"] / 1e9 / iters
        gb = d["bytes"] / 1e9 / iters
        bw = gb / (ms / 1e3) if ms else 0.0
        fl = d["flops"] / iters / (ms / 1e3) / 1e12 if ms else 0.0
        lines.append(f"| {cat} | {ms:.1f} | {gb:.2f} | {bw:.0f} | "
                     f"{100 * bw / peak_hbm:.0f}% | {fl:.1f} |")
    lines.append("\nTop 12 ops by device time:\n")
    lines.append("| op | ms/step | GB/step | GB/s | % peak BW |")
    lines.append("|---|---|---|---|---|")
    for key, d in sorted(per_op.items(),
                         key=lambda kv: -kv[1]["ps"])[:12]:
        ms = d["ps"] / 1e9 / iters
        gb = d["bytes"] / 1e9 / iters
        bw = gb / (ms / 1e3) if ms else 0.0
        nm = key[:80]
        lines.append(f"| `{nm}` | {ms:.2f} | {gb:.2f} | {bw:.0f} | "
                     f"{100 * bw / peak_hbm:.0f}% |")
    tot_gb = sum(d["bytes"] for d in per_cat.values()) / 1e9 / iters
    lines.append(f"\ntotal traced HBM traffic {tot_gb:.1f} GB/step -> "
                 f"memory-bound floor {tot_gb / peak_hbm * 1e3:.0f} ms "
                 f"at peak BW; device busy {step_ms:.1f} ms = "
                 f"{tot_gb / peak_hbm * 1e3 / step_ms * 100:.0f}% "
                 "of that bound")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="/tmp/roofline.md")
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--parse-only", action="store_true",
                    help="skip capture; parse an existing --trace-dir")
    args = ap.parse_args()
    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="roofline_")
    wall_ms = 0.0
    if not args.parse_only:
        from iif_tpu.utils.compile_cache import enable as _cache
        _cache()
        wall_ms = capture_trace(args.iters, trace_dir)
    res = parse_xplane(trace_dir, args.iters)
    text = render(*res, wall_ms, args.iters)
    with open(args.out, "w") as f:
        f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
