"""Cascade R101 LVIS-scale train-step throughput on the real TPU chip
(VERDICT round-2 item 4b): compare b4 (fits HBM) against the reference's
global batch 8 reached via grad_accum=2 — two sequential b4 micro-batches
inside one jitted step.

Honest timing: the axon tunnel's block_until_ready is a no-op, so the
loop chains state and a single scalar readback closes it.

Usage: python scripts/bench_cascade.py [--iters 8]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--depth", type=int, default=101)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from iif_tpu.detection.cascade import CascadeMaskRCNN
    from iif_tpu.detection.detector import DetTrainCfg
    from iif_tpu.detection.losses import DetIIFLoss
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel import make_mesh

    H, W, C, G = 800, 1344, 1203, 100
    mesh = make_mesh(devices=jax.devices()[:1])
    cfg = DetTrainCfg(rpn_nms_pre=2000, mask_gt_stride=2, roi_ext="ml")
    model = CascadeMaskRCNN(num_classes=C, depth=args.depth,
                            cls_predictor="normed",
                            mask_predictor="normed",
                            backbone_remat=True,
                            compute_dtype=jnp.bfloat16)
    loss_cls = DetIIFLoss(weights=jnp.ones(C + 1))

    def batch_of(b):
        rng = np.random.RandomState(0)
        boxes = np.zeros((b, G, 4), np.float32)
        boxes[..., 0] = rng.uniform(0, W - 80, (b, G))
        boxes[..., 1] = rng.uniform(0, H - 80, (b, G))
        boxes[..., 2] = boxes[..., 0] + rng.uniform(16, 80, (b, G))
        boxes[..., 3] = boxes[..., 1] + rng.uniform(16, 80, (b, G))
        ms = cfg.mask_gt_stride
        return {
            "image": jnp.asarray(
                rng.randint(0, 255, (b, H, W, 3), np.uint8)),
            "gt_boxes": jnp.asarray(boxes),
            "gt_labels": jnp.asarray(rng.randint(0, C, (b, G))),
            "gt_valid": jnp.asarray(
                np.arange(G)[None] < rng.randint(8, G, (b, 1))),
            "gt_masks_packed": jnp.asarray(np.packbits(
                rng.randint(0, 2, (b, G, H // ms, W // ms), np.uint8),
                axis=-1)),
        }

    for label, b, accum in (("b4 accum1", 4, 1), ("b8 accum2", 8, 2)):
        trainer = DetectionTrainer(model, loss_cls,
                                   optax.sgd(0.02, momentum=0.9), mesh,
                                   cfg, grad_accum=accum)
        state = trainer.init_state((H, W, 3))
        batch = batch_of(b)
        state, m = trainer._train_step(state, batch, fasa_aug_on=False)
        _ = float(m["loss"])                      # compile + barrier
        t0 = time.time()
        for _ in range(args.iters):
            state, m = trainer._train_step(state, batch,
                                           fasa_aug_on=False)
        _ = float(m["loss"])                      # close the chain
        dt = (time.time() - t0) / args.iters
        print(f"{label}: {dt * 1e3:.1f} ms/step = "
              f"{b / dt:.2f} img/s/chip")
        del state, trainer


if __name__ == "__main__":
    main()
