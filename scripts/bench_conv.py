"""Microbench the detection conv path's building blocks on the TPU.

The LVIS train step is dominated by the backbone/FPN/RPN-head convs
running at ~50 TFLOP/s (docs/performance.md). This sweeps the headline
conv shapes across dtype/precision/feature-count variants to find where
the gap to the MXU peak (~197 TFLOP/s bf16 on v5e) comes from and
whether any program-level change (dtype, dimension ordering, batching)
can claw some back.

Usage: python scripts/bench_conv.py [--iters 30]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.time() - t0) / iters * 1e3


def conv_flops(b, h, w, cin, cout, k):
    return 2 * b * h * w * cin * cout * k * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    b = args.batch

    # the step's heavy conv shapes (800x1344 canvas):
    # P2 RPN/FPN 3x3 @ 200x336x256, C2 stage 3x3 @ 200x336x64,
    # C3 3x3 @ 100x168x128, C4 3x3 @ 50x84x256
    shapes = [
        ("P2 3x3 256->256", (b, 200, 336, 256), 256, 3),
        ("C2 3x3 64->64", (b, 200, 336, 64), 64, 3),
        ("C3 3x3 128->128", (b, 100, 168, 128), 128, 3),
        ("C4 3x3 256->256", (b, 50, 84, 256), 256, 3),
        ("C4 1x1 1024->256", (b, 50, 84, 1024), 256, 1),
    ]
    rng = np.random.RandomState(0)
    for name, xshape, cout, k in shapes:
        cin = xshape[-1]
        fl = conv_flops(xshape[0], xshape[1], xshape[2], cin, cout, k)
        for dt, prec in [(jnp.bfloat16, "default"),
                         (jnp.bfloat16, "highest"),
                         (jnp.float32, "default")]:
            x = jnp.asarray(rng.randn(*xshape), dt)
            kern = jnp.asarray(rng.randn(k, k, cin, cout) * 0.01, dt)

            @jax.jit
            def fwd(x, kern):
                return jax.lax.conv_general_dilated(
                    x, kern, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    precision=prec.upper())

            ms = timed(fwd, x, kern, iters=args.iters)
            # fwd+bwd (the train step runs both; bwd convs are often the
            # slow ones)
            @jax.jit
            def fb(x, kern):
                def loss(x, kern):
                    return jnp.sum(jax.lax.conv_general_dilated(
                        x, kern, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        precision=prec.upper()).astype(jnp.float32))
                g = jax.grad(loss, argnums=(0, 1))(x, kern)
                return g[0]

            ms2 = timed(fb, x, kern, iters=args.iters)
            print(f"{name:22s} {np.dtype(dt).name:9s} prec={prec:8s} "
                  f"fwd {ms:7.2f} ms = {fl / ms / 1e9:6.1f} TF/s | "
                  f"fwd+bwd {ms2:7.2f} ms = {3 * fl / ms2 / 1e9:6.1f} TF/s")


if __name__ == "__main__":
    main()
