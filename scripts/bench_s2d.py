"""Microbench: space-to-depth stem vs plain 7x7/s2 stem on the TPU.

Times a ResNet-50 detection-backbone train step (fwd+bwd, bf16,
frozen_stages=1 / norm_eval like the LVIS config) at detection scale and
a classification fwd+bwd at 224. Honest timing: the axon tunnel backend
ignores block_until_ready, so every iteration chains state and the loop
is closed with one float() readback (see CLAUDE.md).

    python scripts/bench_s2d.py [--batch 8] [--hw 800 1344] [--iters 20]
"""
import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from iif_tpu.models.resnet import ResNet  # noqa: E402


def bench(model, shape, iters):
    v = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1,) + shape[1:]), False)

    def loss_fn(p, x):
        feats = model.apply({"params": p, "batch_stats": v["batch_stats"]},
                            x, True, return_features=True)
        return sum(t.astype(jnp.float32).mean() for t in feats)

    @jax.jit
    def step(p, x):
        g = jax.grad(loss_fn)(p, x)
        # chain: fold a grad summary back into the input so iteration N+1
        # depends on N (forces real execution under the tunnel backend)
        s = sum(t.sum() for t in jax.tree_util.tree_leaves(g))
        return x + (s * 0).astype(x.dtype)

    x = jnp.ones(shape, jnp.bfloat16)
    x = step(v["params"], x)          # compile
    float(x.sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(v["params"], x)
    float(x.sum())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, nargs=2, default=(800, 1344))
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    det = dict(layers=(3, 4, 6, 3), block="bottleneck", frozen_stages=1,
               norm_eval=True, dtype=jnp.bfloat16)
    for tag, shape in (("det", (args.batch, *args.hw, 3)),
                       ("cls", (256, 224, 224, 3))):
        base = bench(ResNet(**det), shape, args.iters)
        s2d = bench(ResNet(**det, s2d_stem=True), shape, args.iters)
        print(f"{tag} {shape}: base {base*1e3:.2f} ms  s2d {s2d*1e3:.2f} ms "
              f"({base/s2d:.3f}x)")


if __name__ == "__main__":
    main()
