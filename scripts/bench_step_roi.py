"""A/B the LVIS train step with the flat-gather vs the Pallas ML RoI
extractor (full e2e step, same harness as bench.py's bench_detection)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax.numpy as jnp


def run(roi_ext, B=4, H=800):
    import optax

    from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
    from iif_tpu.detection.losses import DetIIFLoss
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel import make_mesh, shard_batch

    W, C, G = 1344, 1203, 100
    mesh = make_mesh()
    cfg = DetTrainCfg(rpn_nms_pre=2000, mask_gt_stride=2, roi_ext=roi_ext)
    model = MaskRCNN(num_classes=C, depth=50, compute_dtype=jnp.bfloat16)
    loss_cls = DetIIFLoss(weights=jnp.asarray(
        np.log(100170.0 / np.linspace(64, 2000, C)).astype(np.float32)
        .tolist() + [1.0]))
    trainer = DetectionTrainer(model, loss_cls,
                               optax.sgd(float(os.environ.get('BENCH_LR', 0.02)), momentum=0.9), mesh, cfg)
    state = trainer.init_state((H, W, 3))

    rng = np.random.RandomState(0)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_boxes[..., 0] = rng.uniform(0, W - 100, (B, G))
    gt_boxes[..., 1] = rng.uniform(0, H - 100, (B, G))
    gt_boxes[..., 2] = gt_boxes[..., 0] + rng.uniform(20, 100, (B, G))
    gt_boxes[..., 3] = gt_boxes[..., 1] + rng.uniform(20, 100, (B, G))
    gbatch = shard_batch({
        "image": rng.randn(B, H, W, 3).astype(np.float32),
        "gt_boxes": gt_boxes,
        "gt_labels": rng.randint(0, C, (B, G)).astype(np.int32),
        "gt_valid": (rng.rand(B, G) < 0.3),
        "gt_masks": (rng.rand(B, G, H // 2, W // 2) < 0.1).astype(np.uint8),
    }, mesh)

    for _ in range(3):
        state, metrics = trainer._train_step(state, gbatch,
                                             fasa_aug_on=False)
    _ = float(metrics["loss"])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer._train_step(state, gbatch,
                                             fasa_aug_on=False)
    _ = float(metrics["loss"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"roi_ext={roi_ext}: {ms:.1f} ms/step "
          f"({B * 1e3 / ms:.2f} img/s/chip), loss={float(metrics['loss']):.4f}")
    return ms


def main():
    args = sys.argv[1:] or ["flat", "ml"]
    for a in args:
        parts = a.split(":")
        run(parts[0], int(parts[1]) if len(parts) > 1 else 4,
            int(parts[2]) if len(parts) > 2 else 800)


if __name__ == "__main__":
    main()
