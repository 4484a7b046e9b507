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
    p = argparse.ArgumentParser(description="analysis tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("benchmark")
    b.add_argument("config")
    b.add_argument("checkpoint", nargs="?", default=None)
    b.add_argument("--num-iters", default=50, type=int)
    b.add_argument("--warmup", default=5, type=int)
    b.add_argument("--batch-size", default=1, type=int)

    f = sub.add_parser("flops")
    f.add_argument("config")
    f.add_argument("--shape", nargs=2, type=int, default=[800, 1344])

    l = sub.add_parser("logs")
    l.add_argument("path")
    l.add_argument("--key", default="time")

    args = p.parse_args()
    if args.cmd == "logs":
        from iif_tpu.utils.profiling import analyze_log_json

        print(analyze_log_json(args.path, args.key))
        return

    import jax
    import jax.numpy as jnp

    from iif_tpu.config import Config
    from iif_tpu.detection.detector import (DetTestCfg, MaskRCNN,
                                            maskrcnn_simple_test)
    from iif_tpu.detection.losses import DetCrossEntropyLoss

    cfg = Config.fromfile(args.config)
    model_kw = {k: v for k, v in cfg.model.items() if k != "type"}
    model = MaskRCNN(**model_kw)
    canvas = tuple(cfg.get("pipeline", {}).get("canvas", (800, 1344)))
    loss_cls = DetCrossEntropyLoss(num_classes=cfg.model["num_classes"])

    if args.cmd == "flops":
        from iif_tpu.utils.profiling import flops_of

        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), jnp.zeros((1,) + canvas + (3,)), False)
        fl = flops_of(
            lambda v, x: model.apply(v, x, False,
                                     method=MaskRCNN.extract_feat),
            variables, jnp.zeros((1,) + canvas + (3,)))
        print(f"backbone+FPN flops for input {canvas}: {fl / 1e9:.2f} GFLOPs")
        return

    # benchmark: pure-inference FPS (reference benchmark.py:52-120)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1,) + canvas + (3,)), False)
    if args.checkpoint:
        from iif_tpu.utils.checkpoint import CheckpointManager

        restored = CheckpointManager(args.checkpoint).restore()
        variables = {"params": restored["state"]["params"],
                     "batch_stats": restored["state"]["batch_stats"]}
    test_cfg = DetTestCfg(**cfg.get("test_cfg", {}))
    x = jnp.zeros((args.batch_size,) + canvas + (3,))

    # NOTE: block_until_ready is unreliable on tunneled TPU backends; a
    # host readback of a value depending on the outputs is the only
    # honest sync. Chain iterations through the input so they serialize.
    def _one_iter(v, img):
        out = maskrcnn_simple_test(model, v, img, loss_cls, test_cfg)
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


if __name__ == "__main__":
    main()
