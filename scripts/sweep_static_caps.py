"""Quantify the static-shape caps (VERDICT round-1, weak #6 / next #8).

The TPU build replaces three data-dependent shapes of the reference with
static caps; this script measures what each cap costs at LVIS scale:

1. ``multiclass_nms(nms_pre=...)`` — reference ``bbox_nms.py:8-97`` keeps
   every candidate above score_thr (1e-4) before NMS; we keep the static
   top-``nms_pre`` of the flattened 1000x1204 score matrix. Sweep
   nms_pre and measure (a) how many of the final max_per_img=300
   detections differ vs an exact all-candidates run, (b) wall time.
2. ``rpn_nms_pre`` per level — reference value is itself 2000 (static),
   risk is zero; measured for completeness.
3. ``max_gt`` pipeline cap — LVIS images can carry >100 instances;
   measure assigner/sampler target degradation on synthetic crowded
   images as max_gt shrinks below the true instance count.

Run on the real chip:  python scripts/sweep_static_caps.py
Writes docs/static_caps.md (tables) + /tmp/static_caps.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

P = 1000          # proposals per image (rpn_max_per_img)
C = 1203          # LVIS classes
SCORE_THR = 1e-4
MAX_PER_IMG = 300
NMS_IOU = 0.5


def synth_scores(key, peak: float):
    """Score matrix shaped like a trained LVIS head: background absorbs
    most mass; ``peak`` scales foreground logit concentration (0 = flat
    softmax, larger = peakier/trained-like)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    logits = jax.random.normal(k1, (P, C + 1))
    # background boost: most proposals are background
    logits = logits.at[:, -1].add(4.0)
    # a subset of proposals are confident objects of a random class
    n_obj = 80
    obj_rows = jax.random.choice(k2, P, (n_obj,), replace=False)
    obj_cls = jax.random.randint(k3, (n_obj,), 0, C)
    logits = logits.at[obj_rows, obj_cls].add(peak)
    logits = logits.at[obj_rows, -1].add(-2.0)
    return jax.nn.softmax(logits, axis=-1)


def synth_boxes(key, img_hw=(800, 1333)):
    h, w = img_hw
    k1, k2 = jax.random.split(key)
    ctr = jax.random.uniform(k1, (P, 2)) * jnp.asarray([w, h])
    sz = jax.random.uniform(k2, (P, 2), minval=16.0, maxval=256.0)
    x1 = jnp.clip(ctr[:, 0] - sz[:, 0] / 2, 0, w)
    y1 = jnp.clip(ctr[:, 1] - sz[:, 1] / 2, 0, h)
    x2 = jnp.clip(ctr[:, 0] + sz[:, 0] / 2, 0, w)
    y2 = jnp.clip(ctr[:, 1] + sz[:, 1] / 2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def det_set(out, k=MAX_PER_IMG):
    boxes, scores, labels, valid = [np.asarray(x) for x in out]
    v = valid.astype(bool)
    return {(int(l), round(float(b[0]), 1), round(float(b[1]), 1),
             round(float(b[2]), 1), round(float(b[3]), 1))
            for b, l in zip(boxes[v], labels[v])}


def sweep_nms_pre():
    import functools

    from iif_tpu.ops.nms import multiclass_nms

    @functools.lru_cache(None)
    def _fn(nms_pre):
        return jax.jit(lambda b, s: multiclass_nms(
            b, s, SCORE_THR, NMS_IOU, MAX_PER_IMG, nms_pre=nms_pre))

    rows = []
    for peak in (4.0, 6.0, 8.0):
        key = jax.random.PRNGKey(int(peak * 10))
        scores = synth_scores(key, peak)
        boxes = synth_boxes(jax.random.fold_in(key, 1))
        n_above = int((np.asarray(scores[:, :C]) > SCORE_THR).sum())

        # "exact" baseline: nms_pre=8192. True reference semantics NMS
        # every >thr candidate; for trained (peaked) distributions that
        # count is a few thousand (candidates_above_thr column reports
        # the regime), so 8192 is effectively exact; greedy NMS beyond
        # ~16k boxes is minutes even blocked (sequential fixpoint).
        EXACT = 8192
        ref = None
        for nms_pre in (512, 1024, 2048, 4096, EXACT):
            fn = _fn(nms_pre)
            out = fn(boxes, scores)
            jax.block_until_ready(out)
            # honest timing: force host readback each iter
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = fn(boxes, scores)
                float(np.asarray(out[1]).sum())
            dt = (time.perf_counter() - t0) / reps * 1e3
            s = det_set(out)
            if nms_pre == EXACT:
                ref = s
            rows.append(dict(peak=peak, nms_pre=nms_pre,
                             candidates_above_thr=n_above,
                             n_dets=len(s), ms=round(dt, 2), dets=s))
        for r in rows:
            if r["peak"] == peak:
                inter = len(r["dets"] & ref)
                union = len(r["dets"] | ref) or 1
                r["jaccard_vs_exact"] = round(inter / union, 4)
                r["missing_vs_exact"] = len(ref - r["dets"])
                del r["dets"]
    return rows


def sweep_max_gt():
    """Crowded-image target fidelity: n_true GT boxes, pipeline cap
    max_gt; measure fraction of positive anchors/RoIs lost."""
    from iif_tpu.detection.bbox_head import bbox_targets

    rows = []
    key = jax.random.PRNGKey(0)
    n_true = 200
    h, w = 800, 1333
    kb, kp = jax.random.split(key)
    ctr = jax.random.uniform(kb, (n_true, 2)) * jnp.asarray([w, h])
    sz = jax.random.uniform(jax.random.fold_in(kb, 1), (n_true, 2),
                            minval=32.0, maxval=128.0)
    gt = jnp.stack([jnp.clip(ctr[:, 0] - sz[:, 0] / 2, 0, w),
                    jnp.clip(ctr[:, 1] - sz[:, 1] / 2, 0, h),
                    jnp.clip(ctr[:, 0] + sz[:, 0] / 2, 0, w),
                    jnp.clip(ctr[:, 1] + sz[:, 1] / 2, 0, h)], axis=-1)
    labels = jax.random.randint(jax.random.fold_in(kb, 2), (n_true,), 0, C)
    # proposals: jittered copies of GT + random negatives
    jit_p = gt + jax.random.normal(kp, gt.shape) * 8.0
    rand_p = synth_boxes(jax.random.fold_in(kp, 1))
    props = jnp.concatenate([jit_p, rand_p])[:P][None]
    pvalid = jnp.ones((1, props.shape[1]), bool)

    for max_gt in (50, 100, 150, 200, 300):
        g = min(max_gt, 300)
        gt_pad = jnp.zeros((1, g, 4))
        lb_pad = jnp.zeros((1, g), jnp.int32)
        vd_pad = jnp.zeros((1, g), bool)
        n = min(n_true, g)
        gt_pad = gt_pad.at[0, :n].set(gt[:n])
        lb_pad = lb_pad.at[0, :n].set(labels[:n])
        vd_pad = vd_pad.at[0, :n].set(True)
        tgts = jax.jit(lambda k, p, pv, gb, gl, gv: bbox_targets(
            k, p, pv, gb, gl, gv, C, num_samples=512,
            pos_fraction=0.25))(jax.random.PRNGKey(1), props, pvalid,
                                gt_pad, lb_pad, vd_pad)
        n_pos = int((np.asarray(tgts.labels) < C).sum())
        rows.append(dict(max_gt=max_gt, gt_kept=n, n_pos_rois=n_pos))
    return rows


def main():
    print(f"devices: {jax.devices()}")
    nms_rows = sweep_nms_pre()
    gt_rows = sweep_max_gt()
    out = dict(nms_pre=nms_rows, max_gt=gt_rows)
    with open("/tmp/static_caps.json", "w") as f:
        json.dump(out, f, indent=1, default=str)
    for r in nms_rows:
        print(r)
    for r in gt_rows:
        print(r)


if __name__ == "__main__":
    main()
