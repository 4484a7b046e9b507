"""Full LVIS train step with/without the space-to-depth stem.

bench.py's exact detection workload (b8, 800x1344, 1203 cls, bf16,
roi_ext='ml'), toggling model.s2d_stem. Honest readback timing.

    python scripts/bench_s2d_e2e.py [--iters 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np


def run(s2d: bool, iters: int) -> float:
    import optax

    from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
    from iif_tpu.detection.losses import DetIIFLoss
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel import make_mesh, shard_batch

    B, H, W, C, G = 8, 800, 1344, 1203, 100
    mesh = make_mesh()
    cfg = DetTrainCfg(rpn_nms_pre=2000, mask_gt_stride=2, roi_ext="ml")
    model = MaskRCNN(num_classes=C, depth=50, compute_dtype=jnp.bfloat16,
                     s2d_stem=s2d)
    loss_cls = DetIIFLoss(weights=jnp.asarray(
        np.log(100170.0 / np.linspace(64, 2000, C)).astype(np.float32)
        .tolist() + [1.0]))
    trainer = DetectionTrainer(model, loss_cls,
                               optax.sgd(0.001, momentum=0.9), mesh, cfg)
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
    for _ in range(iters):
        state, metrics = trainer._train_step(state, gbatch,
                                             fasa_aug_on=False)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    print(f"s2d={s2d}: {dt*1e3:.1f} ms/step = {B/dt:.2f} img/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    base = run(False, args.iters)
    s2d = run(True, args.iters)
    print(f"ratio: {base/s2d:.3f}x")


if __name__ == "__main__":
    main()
