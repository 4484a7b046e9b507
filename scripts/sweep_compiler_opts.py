"""Server-side XLA compiler-option sweep for the LVIS train step.

The axon tunnel's client rejects TPU XLA_FLAGS at startup (fatal
``Unknown flag in XLA_FLAGS``) — but per-jit ``compiler_options`` route
to the backend compiler and ARE accepted. This sweeps scheduling-level
options over the exact bench.py b8 LVIS step (the kernels are already at
par; docs/performance.md says the remaining time is scheduling).

Usage: python scripts/sweep_compiler_opts.py [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASES = [
    ("baseline", {}),
    ("latency-hiding-sched", {
        "xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("scoped-vmem-32MB", {
        "xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("lhs+vmem32", {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_tpu_scoped_vmem_limit_kib": "32768"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
    from iif_tpu.detection.losses import DetIIFLoss
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel import make_mesh, shard_batch

    B, H, W, C, G = args.batch, 800, 1344, 1203, 100
    mesh = make_mesh()
    cfg = DetTrainCfg(rpn_nms_pre=2000, mask_gt_stride=2, roi_ext="ml")
    model = MaskRCNN(num_classes=C, depth=50, compute_dtype=jnp.bfloat16)
    loss_cls = DetIIFLoss(weights=jnp.asarray(
        np.log(100170.0 / np.linspace(64, 2000, C)).astype(np.float32)
        .tolist() + [1.0]))
    tx = optax.sgd(0.001, momentum=0.9)
    trainer = DetectionTrainer(model, loss_cls, tx, mesh, cfg)

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

    lowered = None
    for name, opts in CASES:
        # donation is baked into trainer._train_step's jit wrapper, so
        # the lowered computation keeps the donated aliases
        state = trainer.init_state((H, W, 3))
        if lowered is None:
            print("lowering...", flush=True)
            lowered = trainer._train_step.lower(state, gbatch,
                                                fasa_aug_on=False)
        t0 = time.time()
        try:
            compiled = lowered.compile(
                compiler_options=opts if opts else None)
        except Exception as e:  # noqa: BLE001 — report + continue sweep
            print(f"{name}: compile FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"{name}: compiled in {time.time() - t0:.0f}s", flush=True)
        s = state
        for _ in range(3):
            s, metrics = compiled(s, gbatch)
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, metrics = compiled(s, gbatch)
        loss = float(metrics["loss"])
        dt = (time.perf_counter() - t0) / args.iters * 1000
        print(f"{name}: {dt:.1f} ms/step  ({B / (dt / 1000):.2f} img/s, "
              f"loss {loss:.3f})", flush=True)
        del compiled, s


if __name__ == "__main__":
    main()
