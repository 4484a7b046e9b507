"""Sub-profile the detection conv path: backbone / FPN / RPN head, fwd and
fwd+bwd, plus layout/precision variants."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters=10, label=""):
    out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jax.tree_util.tree_leaves(out)[0].sum())
    print(f"{label}: {(time.time() - t0) / iters * 1000:.1f} ms", flush=True)


def main():
    from iif_tpu.detection.detector import MaskRCNN
    from iif_tpu.detection.necks import FPN
    from iif_tpu.detection.rpn import RPNHead
    from iif_tpu.models.resnet import ResNet

    B, H, W = 4, 800, 1344
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)

    bb = ResNet(layers=(3, 4, 6, 3), block="bottleneck", frozen_stages=1,
                dtype=jnp.bfloat16)
    vb = jax.jit(bb.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)

    @jax.jit
    def bb_fwd(params, x):
        f = bb.apply({"params": params,
                      "batch_stats": vb["batch_stats"]}, x, True,
                     return_features=True, mutable=["batch_stats"])[0]
        return sum(t.astype(jnp.float32).sum() for t in f)

    timed(bb_fwd, (vb["params"], images), label="backbone fwd (train)")

    @jax.jit
    def bb_bwd(params, x):
        return jax.grad(lambda p: bb_fwd(p, x))(params)

    timed(bb_bwd, (vb["params"], images), label="backbone fwd+bwd")

    feats_shapes = [(B, H // s, W // s, c) for s, c in
                    zip((4, 8, 16, 32), (256, 512, 1024, 2048))]
    feats = [jnp.asarray(rng.randn(*s), jnp.bfloat16) for s in feats_shapes]

    fpn = FPN(out_channels=256, num_outs=5, dtype=jnp.bfloat16)
    vf = fpn.init(jax.random.PRNGKey(0), feats)

    @jax.jit
    def fpn_bwd(params, feats):
        def f(p):
            outs = fpn.apply({"params": p}, feats)
            return sum(t.astype(jnp.float32).sum() for t in outs)
        return jax.grad(f)(params)

    timed(fpn_bwd, (vf["params"], feats), label="FPN fwd+bwd")

    fpn_outs = [jnp.asarray(
        rng.randn(B, -(-H // s), -(-W // s), 256), jnp.bfloat16)
        for s in (4, 8, 16, 32, 64)]
    rpn = RPNHead(num_anchors=3, dtype=jnp.bfloat16)
    vr = rpn.init(jax.random.PRNGKey(0), fpn_outs)

    @jax.jit
    def rpn_bwd(params, feats):
        def f(p):
            cs, bp = rpn.apply({"params": p}, feats)
            return (sum(t.astype(jnp.float32).sum() for t in cs)
                    + sum(t.astype(jnp.float32).sum() for t in bp))
        return jax.grad(f)(params)

    timed(rpn_bwd, (vr["params"], fpn_outs), label="RPN head fwd+bwd")

    # variant: bf16 input image (kills the fp32 stem conv)
    images16 = images.astype(jnp.bfloat16)
    timed(bb_bwd, (vb["params"], images16), label="backbone fwd+bwd bf16 in")


if __name__ == "__main__":
    main()
