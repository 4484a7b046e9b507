"""Multi-level Pallas RoIAlign vs the XLA flat-gather extractor at LVIS
train shapes (b4 800x1344 canvas -> FPN levels 200x336..25x42, C=256,
R=2048 7x7 and R=512 14x14). Checks numerics and times fwd / fwd+bwd.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
from iif_tpu.utils.compile_cache import enable as _ec
_ec()
import jax.numpy as jnp


def bench(fn, args, iters=10):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor
    from iif_tpu.ops.pallas.roi_align_kernel import ml_supported

    rng = np.random.RandomState(0)
    b, c = 4, 256
    dims = [(200, 336), (100, 168), (50, 84), (25, 42)]
    feats = [jnp.asarray(rng.randn(b, h, w, c), jnp.bfloat16)
             for h, w in dims]
    print("ml_supported:", ml_supported(feats))

    for r, size in ((2048, (7, 7)), (512, (14, 14))):
        # RPN-like rois: log-uniform scale, aspect in [1/4, 4] (anchor
        # ratios 0.5-2 plus regression), a few percent of extreme-aspect
        # outliers to exercise the misfit fallback path
        centers = rng.rand(r, 2) * [1300, 780]
        scale_px = np.exp(rng.uniform(np.log(16), np.log(512), r))
        aspect = np.exp(rng.uniform(np.log(0.25), np.log(4.0), r))
        n_out = r // 50
        aspect[:n_out] = np.exp(rng.uniform(np.log(8), np.log(20), n_out))
        w_px = scale_px * np.sqrt(aspect)
        h_px = scale_px / np.sqrt(aspect)
        x1 = np.clip(centers[:, 0] - w_px / 2, 0, 1343)
        y1 = np.clip(centers[:, 1] - h_px / 2, 0, 799)
        x2 = np.clip(centers[:, 0] + w_px / 2, 0, 1343)
        y2 = np.clip(centers[:, 1] + h_px / 2, 0, 799)
        bi = rng.randint(0, b, r)
        rois = jnp.asarray(np.stack([bi, x1, y1, x2, y2], 1), jnp.float32)

        flat = SingleRoIExtractor(size)
        ml = SingleRoIExtractor(size, use_pallas="ml")
        mlf = SingleRoIExtractor(size, use_pallas="ml_fast")
        f_flat = jax.jit(lambda ff, rr: flat(list(ff), rr))
        f_ml = jax.jit(lambda ff, rr: ml(list(ff), rr))
        f_mlf = jax.jit(lambda ff, rr: mlf(list(ff), rr))

        a = np.asarray(f_flat(tuple(feats), rois), np.float32)
        bb = np.asarray(f_ml(tuple(feats), rois), np.float32)
        err = np.abs(a - bb).max()
        rel = err / (np.abs(a).max() + 1e-9)
        print(f"R={r} {size}: max abs err {err:.4e} (rel {rel:.2e})")

        t_flat = bench(f_flat, (tuple(feats), rois))
        t_ml = bench(f_ml, (tuple(feats), rois))
        t_mlf = bench(f_mlf, (tuple(feats), rois))
        errf = np.abs(a - np.asarray(f_mlf(tuple(feats), rois),
                                     np.float32)).max()
        print(f"  fwd: flat {t_flat:.2f} ms | ml {t_ml:.2f} ms "
              f"({t_flat / t_ml:.2f}x) | ml_fast {t_mlf:.2f} ms "
              f"(err {errf:.1e})")

        def loss_flat(ff, rr):
            return (flat(list(ff), rr).astype(jnp.float32) ** 2).sum()

        def loss_ml(ff, rr):
            return (ml(list(ff), rr).astype(jnp.float32) ** 2).sum()

        g_flat = jax.jit(jax.grad(loss_flat))
        g_ml = jax.jit(jax.grad(loss_ml))
        ga = g_flat(tuple(feats), rois)
        gb = g_ml(tuple(feats), rois)
        gerr = max(float(jnp.abs(x.astype(jnp.float32)
                                 - y.astype(jnp.float32)).max())
                   for x, y in zip(ga, gb))
        print(f"  grad max abs err {gerr:.4e}")
        t_gflat = bench(g_flat, (tuple(feats), rois))
        t_gml = bench(g_ml, (tuple(feats), rois))
        print(f"  fwd+bwd: flat {t_gflat:.2f} ms | ml {t_gml:.2f} ms "
              f"({t_gflat / t_gml:.2f}x)")


if __name__ == "__main__":
    main()
