"""MaskRCNN R50 LVIS-scale train-step batch sweep on the real TPU chip.

Explores whether the 28.6 img/s/chip b8 headline improves at larger
per-chip batches (remat frees the activation memory; the step is
HBM-bound so recompute may be cheaper than the saved-activation
traffic).

Honest timing: the axon tunnel's block_until_ready is a no-op, so the
loop chains state and a single scalar readback closes it.

Usage: python scripts/sweep_batch.py [--iters 10] [--cases b8,b12r,b16r]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = {  # name -> (batch, backbone_remat)
    "b8": (8, False),
    "b8r": (8, True),
    "b12r": (12, True),
    "b16r": (16, True),
    "b24r": (24, True),
    "b32r": (32, True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cases", default="b8,b8r,b12r,b16r")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from iif_tpu.detection.detector import DetTrainCfg, MaskRCNN
    from iif_tpu.detection.losses import DetIIFLoss
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel import make_mesh
    from iif_tpu.utils.compile_cache import enable as _cache

    _cache()
    H, W, C, G = 800, 1344, 1203, 100
    mesh = make_mesh(devices=jax.devices()[:1])
    cfg = DetTrainCfg(rpn_nms_pre=2000, mask_gt_stride=2, roi_ext="ml")
    loss_cls = DetIIFLoss(weights=jnp.asarray(
        np.log(100170.0 / np.linspace(64, 2000, C)).astype(np.float32)
        .tolist() + [1.0]))

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
                (rng.rand(b, G, H // ms, W // ms) < 0.1).astype(np.uint8),
                axis=-1)),
        }

    for name in args.cases.split(","):
        b, remat = CASES[name]
        model = MaskRCNN(num_classes=C, depth=50, backbone_remat=remat,
                         compute_dtype=jnp.bfloat16)
        trainer = DetectionTrainer(model, loss_cls,
                                   optax.sgd(0.02, momentum=0.9), mesh, cfg)
        try:
            state = trainer.init_state((H, W, 3))
            batch = batch_of(b)
            for _ in range(2):
                state, m = trainer._train_step(state, batch,
                                               fasa_aug_on=False)
            _ = float(m["loss"])                  # compile + barrier
            t0 = time.time()
            for _ in range(args.iters):
                state, m = trainer._train_step(state, batch,
                                               fasa_aug_on=False)
            _ = float(m["loss"])                  # close the chain
            dt = (time.time() - t0) / args.iters
            print(f"{name}: {dt * 1e3:.1f} ms/step = "
                  f"{b / dt:.2f} img/s/chip", flush=True)
        except Exception as e:  # OOM etc: report and keep sweeping
            print(f"{name}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:160]})", flush=True)
        del trainer
        state = None


if __name__ == "__main__":
    main()
