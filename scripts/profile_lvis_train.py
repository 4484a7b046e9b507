"""Decompose the LVIS MaskRCNN train step on the real TPU chip.

Times each stage of the pinned recipe (b4, 800x1344, 1203 classes, R50
bf16, rpn_nms_pre=2000, mask_gt_stride=2) with honest host-readback
timing (the axon tunnel's block_until_ready is a no-op — chain a scalar
through the loop and read it back once).

Usage: python scripts/profile_lvis_train.py [--batch 4] [--iters 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters, chain=None):
    """Run fn(args) iters times; returns ms/iter. ``chain`` maps the
    output to a scalar folded into the next call via args[0] (defaults to
    summing the first output leaf)."""
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    float(leaves[0].sum())          # warmup + compile barrier
    t0 = time.time()
    acc = 0.0
    for _ in range(iters):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
    acc = float(leaves[0].sum())    # one readback closes the chain
    dt = (time.time() - t0) / iters * 1000
    return dt, acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--nms-pre", type=int, default=2000)
    ap.add_argument("--mask-stride", type=int, default=2)
    args = ap.parse_args()

    import optax

    from iif_tpu.detection.bbox_head import bbox_targets
    from iif_tpu.detection.detector import (
        DetTrainCfg, MaskRCNN, fpn_shapes, make_anchor_generator,
        maskrcnn_loss)
    from iif_tpu.detection.losses import DetIIFLoss
    from iif_tpu.detection.mask_head import mask_targets
    from iif_tpu.detection.roi_extractor import SingleRoIExtractor
    from iif_tpu.detection.rpn import rpn_loss, rpn_proposals

    B, H, W, C = args.batch, 800, 1344, 1203
    G = 100
    cfg = DetTrainCfg(rpn_nms_pre=args.nms_pre,
                      mask_gt_stride=args.mask_stride)
    model = MaskRCNN(num_classes=C, depth=50, compute_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rng.randn(B, H, W, 3), jnp.float32),
        "gt_boxes": jnp.asarray(
            np.stack([np.tile([10, 10, 200, 200], (G, 1))] * B), jnp.float32),
        "gt_labels": jnp.zeros((B, G), jnp.int32),
        "gt_valid": jnp.asarray(rng.rand(B, G) < 0.3),
        "gt_masks": jnp.zeros(
            (B, G, H // args.mask_stride, W // args.mask_stride), jnp.uint8),
    }
    loss_cls = DetIIFLoss(weights=jnp.ones(C + 1))
    print(f"init model (b{B}, {H}x{W}, {C} classes, bf16)...", flush=True)
    variables = jax.jit(model.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)), False)
    tx = optax.sgd(0.02, momentum=0.9)
    opt_state = tx.init(variables["params"])
    key = jax.random.PRNGKey(1)

    # ---------------- full train step
    @jax.jit
    def full_step(params, opt_state, batch):
        def loss_fn(p):
            total, losses, aux = maskrcnn_loss(
                model, {"params": p,
                        "batch_stats": variables.get("batch_stats", {})},
                batch, key, loss_cls, cfg)
            return total, losses
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_opt, total

    print("compiling full step...", flush=True)
    params, new_opt, total = full_step(variables["params"], opt_state, batch)
    float(total)
    t0 = time.time()
    p = variables["params"]
    o = opt_state
    for _ in range(args.iters):
        p, o, total = full_step(p, o, batch)
    loss_val = float(total)            # force execution BEFORE reading clock
    dt_full = (time.time() - t0) / args.iters * 1000
    print(f"full train step: {dt_full:.1f} ms  "
          f"({B / (dt_full / 1000):.2f} img/s, loss {loss_val:.3f})",
          flush=True)

    # ---------------- forward only
    @jax.jit
    def fwd_only(params, batch):
        total, losses, aux = maskrcnn_loss(
            model, {"params": params,
                    "batch_stats": variables.get("batch_stats", {})},
            batch, key, loss_cls, cfg)
        return total

    dt, _ = timed(fwd_only, (variables["params"], batch), args.iters)
    print(f"loss forward only: {dt:.1f} ms", flush=True)

    # ---------------- backbone+FPN (+RPN conv) fwd+bwd
    @jax.jit
    def bb_step(params, batch):
        def f(p):
            feats, _ = model.apply(
                {"params": p, "batch_stats": variables.get("batch_stats", {})},
                batch["image"], True, method=MaskRCNN.extract_feat,
                mutable=["batch_stats"])
            cls_scores, bbox_preds = model.apply(
                {"params": p, "batch_stats": {}}, feats,
                method=MaskRCNN.forward_rpn)
            return (sum(s.astype(jnp.float32).sum() for s in cls_scores)
                    + sum(d.astype(jnp.float32).sum() for d in bbox_preds)
                    + sum(f_.astype(jnp.float32).sum() for f_ in feats))
        return jax.grad(f)(params)

    dt, _ = timed(bb_step, (variables["params"], batch), args.iters)
    print(f"backbone+FPN+RPNhead fwd+bwd: {dt:.1f} ms", flush=True)

    # shared intermediates for component timings
    feats = model.apply(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})},
        batch["image"], False, method=MaskRCNN.extract_feat)
    feats = jax.tree_util.tree_map(jax.lax.stop_gradient, feats)
    cls_scores, bbox_preds = model.apply(
        {"params": variables["params"], "batch_stats": {}}, feats,
        method=MaskRCNN.forward_rpn)
    gen = make_anchor_generator()
    shapes = fpn_shapes((H, W))
    anchors_np = gen.grid_anchors(shapes)
    anchors = jnp.asarray(np.concatenate(anchors_np, 0))
    valid = jnp.asarray(np.concatenate(gen.valid_flags(shapes, (H, W)), 0))
    anchors_lvl = [jnp.asarray(a) for a in anchors_np]

    # ---------------- RPN anchor-target loss
    rpn_fn = jax.jit(lambda cs, bp: rpn_loss(
        cs, bp, anchors, valid, batch["gt_boxes"], batch["gt_valid"], key,
        num_samples=cfg.rpn_num_samples,
        pos_fraction=cfg.rpn_pos_fraction)[0])
    dt, _ = timed(rpn_fn, (cls_scores, bbox_preds), args.iters)
    print(f"rpn_loss (anchor targets, fwd): {dt:.1f} ms", flush=True)

    # ---------------- RPN proposals (top-k + NMS)
    prop_fn = jax.jit(lambda cs, bp: rpn_proposals(
        cs, bp, anchors_lvl, (H, W), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou)[0])
    dt, _ = timed(prop_fn, (cls_scores, bbox_preds), args.iters)
    print(f"rpn_proposals (topk+NMS): {dt:.1f} ms", flush=True)

    proposals, _, prop_valid = jax.jit(lambda cs, bp: rpn_proposals(
        cs, bp, anchors_lvl, (H, W), nms_pre=cfg.rpn_nms_pre,
        max_per_img=cfg.rpn_max_per_img, nms_iou=cfg.rpn_nms_iou))(
            cls_scores, bbox_preds)

    # ---------------- RCNN targets (assign+sample)
    tgt_fn = jax.jit(lambda props: bbox_targets(
        key, props, prop_valid, batch["gt_boxes"], batch["gt_labels"],
        batch["gt_valid"], C, num_samples=cfg.rcnn_num_samples,
        pos_fraction=cfg.rcnn_pos_fraction).rois)
    dt, _ = timed(tgt_fn, (proposals,), args.iters)
    print(f"bbox_targets (assign+sample): {dt:.1f} ms", flush=True)

    tgts = jax.jit(lambda props: bbox_targets(
        key, props, prop_valid, batch["gt_boxes"], batch["gt_labels"],
        batch["gt_valid"], C, num_samples=cfg.rcnn_num_samples,
        pos_fraction=cfg.rcnn_pos_fraction))(proposals)
    r = cfg.rcnn_num_samples
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.float32), r)
    rois5 = jnp.concatenate([bidx[:, None], tgts.rois.reshape(-1, 4)], 1)

    # ---------------- RoI extract 7x7: fwd and fwd+bwd
    ex = SingleRoIExtractor((7, 7))
    ex_fwd = jax.jit(lambda f: ex(f[:4], rois5).sum())
    dt, _ = timed(ex_fwd, (feats,), args.iters)
    print(f"roi extract 7x7 fwd (R={rois5.shape[0]}): {dt:.1f} ms",
          flush=True)
    ex_bwd = jax.jit(lambda f: jax.grad(
        lambda ff: ex(ff[:4], rois5).astype(jnp.float32).sum())(f)[0].sum())
    dt, _ = timed(ex_bwd, (feats,), args.iters)
    print(f"roi extract 7x7 fwd+bwd: {dt:.1f} ms", flush=True)

    # ---------------- bbox head fwd+bwd (2048 x 7x7x256 -> 1024 -> heads)
    @jax.jit
    def head_step(params, roi_feats):
        def f(p):
            cls_score, bbox_pred, emb = model.apply(
                {"params": p, "batch_stats": {}}, roi_feats,
                method=MaskRCNN.forward_bbox)
            return (cls_score.astype(jnp.float32).sum()
                    + bbox_pred.astype(jnp.float32).sum())
        return jax.grad(f)(params)

    roi_feats = ex(feats[:4], rois5)
    dt, _ = timed(head_step, (variables["params"], roi_feats), args.iters)
    print(f"bbox head fwd+bwd: {dt:.1f} ms", flush=True)

    # ---------------- mask path: extract 14x14 + targets + head
    m = cfg.num_mask_rois
    pos_rois5 = rois5.reshape(B, r, 5)[:, :m].reshape(-1, 5)
    pos_gt = tgts.pos_gt_inds[:, :m].reshape(-1)
    mex = SingleRoIExtractor((14, 14))
    mex_fn = jax.jit(lambda f: mex(f[:4], pos_rois5).sum())
    dt, _ = timed(mex_fn, (feats,), args.iters)
    print(f"roi extract 14x14 fwd (R={pos_rois5.shape[0]}): {dt:.1f} ms",
          flush=True)

    mt_fn = jax.jit(lambda gm: mask_targets(
        pos_rois5, pos_gt, gm, cfg.mask_size,
        gt_stride=cfg.mask_gt_stride).sum())
    dt, _ = timed(mt_fn, (batch["gt_masks"],), args.iters)
    print(f"mask_targets (stride {cfg.mask_gt_stride}): {dt:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
