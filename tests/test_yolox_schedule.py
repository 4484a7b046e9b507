"""YOLOX training-schedule parity: the LR policy
(yolox_lrupdater_hook.py), the mode-switch hook (yolox_mode_switch_hook.py
— no-aug phase + L1 loss), and the n/a-by-construction notes for
SyncNormHook / SyncRandomSizeHook.
"""
import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

H = W = 128
MAX_GT = 4


# --------------------------------------------------------------- LR oracle
def _ref_yolox_lr(it, *, base_lr, steps_per_epoch, epochs,
                  num_last_epochs=15, warmup_epochs=5, warmup_ratio=1.0,
                  min_lr_ratio=0.05):
    """Transcription of the reference YOLOXLrUpdaterHook.get_lr /
    get_warmup_lr (yolox_lrupdater_hook.py:28-67; by_epoch=False,
    warmup_by_epoch=True) used as a test oracle."""
    warmup_iters = warmup_epochs * steps_per_epoch
    max_iters = epochs * steps_per_epoch
    last_iter = num_last_epochs * steps_per_epoch
    target_lr = base_lr * min_lr_ratio

    progress = it + 1
    if progress >= max_iters - last_iter:
        regular = target_lr
    else:
        frac = (progress - warmup_iters) / (max_iters - warmup_iters
                                            - last_iter)
        regular = target_lr + 0.5 * (base_lr - target_lr) * (
            1.0 + math.cos(math.pi * frac))
    if it < warmup_iters:
        # get_warmup_lr scales self.base_lr (yolox_lrupdater_hook.py:36-42
        # passes base_lr; the local name regular_lr is a misnomer)
        k = warmup_ratio * ((it + 1) / float(warmup_iters)) ** 2
        return base_lr * k
    return regular


@pytest.mark.parametrize("spe,epochs,last,wu", [(7, 30, 5, 2),
                                                (11, 300, 15, 5)])
def test_yolox_lr_schedule_matches_reference(spe, epochs, last, wu):
    from iif_tpu.engine.schedules import build_yolox_lr_schedule

    kw = dict(base_lr=0.01, steps_per_epoch=spe, epochs=epochs,
              num_last_epochs=last, warmup_epochs=wu,
              warmup_ratio=1.0, min_lr_ratio=0.05)
    sched = build_yolox_lr_schedule(**kw)
    steps = np.unique(np.concatenate([
        np.arange(0, min(spe * epochs, 200)),
        np.linspace(0, spe * epochs - 1, 97).astype(int)]))
    got = np.asarray(jax.vmap(sched)(jnp.asarray(steps, jnp.int32)))
    want = np.array([_ref_yolox_lr(int(i), **kw) for i in steps])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9)
    # phase sanity: warmup rises from ~0, tail is exactly the target
    assert got[0] < 1e-4 and abs(got[-1] - 0.01 * 0.05) < 1e-9


def test_yolox_lr_policy_selected_from_config(tmp_path):
    """The train CLI picks the YOLOX policy from lr_config.policy."""
    from iif_tpu.engine.schedules import (build_lr_schedule,
                                          build_yolox_lr_schedule)

    y = build_yolox_lr_schedule(0.01, 10, 30, num_last_epochs=5,
                                warmup_epochs=2)
    s = build_lr_schedule(0.01, 10, 30)
    assert abs(float(y(299)) - 0.01 * 0.05) < 1e-9
    assert float(s(299)) > float(y(299))


# ------------------------------------------------------------- mode switch
def test_update_skip_type_keys_filters_extras():
    from iif_tpu.detection.pipeline import (DetectionPipeline,
                                            build_extra_transforms)

    extras = build_extra_transforms([
        dict(type="Mosaic", img_scale=(64, 64)),
        dict(type="RandomAffine"),
        dict(type="MixUp", img_scale=(64, 64)),
        dict(type="PhotoMetricDistortion"),
    ])
    pipe = DetectionPipeline(canvas=(64, 64), scales=[(64, 64)],
                             with_mask=False, extra_transforms=extras,
                             emit_uint8=False, pack_masks=False)
    assert len(pipe.extra_transforms) == 4
    pipe.update_skip_type_keys(("Mosaic", "RandomAffine", "MixUp"))
    kept = [type(t).__name__ for t in pipe.extra_transforms]
    assert kept == ["PhotoMetricDistortion"]
    # idempotent + re-filterable from the full set
    pipe.update_skip_type_keys(("MixUp",))
    kept = [type(t).__name__ for t in pipe.extra_transforms]
    assert kept == ["Mosaic", "RandomAffine", "PhotoMetricDistortion"]


def _demo_batch(rng):
    img = rng.randn(1, H, W, 3).astype(np.float32)
    boxes = np.zeros((1, MAX_GT, 4), np.float32)
    boxes[0, 0] = [16, 24, 88, 96]
    return {
        "image": jnp.asarray(img),
        "gt_boxes": jnp.asarray(boxes),
        "gt_labels": jnp.zeros((1, MAX_GT), jnp.int32),
        "gt_valid": jnp.asarray(
            np.pad(np.ones((1, 1), bool), ((0, 0), (0, MAX_GT - 1)))),
    }


def test_trainer_use_l1_adds_l1_loss_term():
    """The static use_l1 switch (YOLOXModeSwitchHook's
    ``bbox_head.use_l1 = True``) threads through DetectionTrainer and
    adds the loss_l1 metric."""
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.detection.single_stage import SSTrainCfg
    from iif_tpu.engine.detection import DetectionTrainer
    from iif_tpu.parallel.mesh import make_mesh

    model, _, _ = build_detector({"type": "YOLOX", "num_classes": 3})
    trainer = DetectionTrainer(model, None, optax.sgd(1e-3), make_mesh(),
                               train_cfg=SSTrainCfg())
    state = trainer.init_state((H, W, 3))
    batch = _demo_batch(np.random.RandomState(0))
    state, m0 = trainer._train_step(state, batch, use_l1=False)
    assert "loss_l1" not in m0
    state, m1 = trainer._train_step(state, batch, use_l1=True)
    assert np.isfinite(float(m1["loss_l1"]))
    assert np.isfinite(float(m1["loss"]))


# ----------------------------------------------------------------- EMA
def test_ema_momentum_matches_reference_formulas():
    """Golden vs the hook lambdas (ema.py:108-124)."""
    from iif_tpu.engine.detection import ema_momentum

    m, total = 0.0002, 2000
    for x in [0, 1, 7, 100, 1999, 5000]:
        want = (1 - m) * math.exp(-(1 + x) / total) + m
        got = float(ema_momentum({"momentum": m, "mode": "exp",
                                  "total_iter": total}, x))
        # f32 device math: ~1e-8 abs error on the exp formula
        assert abs(got - want) < 1e-7, (x, got, want)
        want_lin = min(m ** 1, (1 + x) / (100 + x))
        got_lin = float(ema_momentum({"momentum": m, "mode": "linear",
                                      "warm_up": 100}, x))
        assert abs(got_lin - want_lin) < 1e-9
        # const = mmcv's plain EMAHook: momentum**interval + the same
        # (1+x)/(warm_up+x) early ramp — NOT a raw constant
        want_c = min(m ** 2, (1 + x) / (100 + x))
        got_c = float(ema_momentum({"momentum": m, "mode": "const",
                                    "interval": 2, "warm_up": 100}, x))
        assert abs(got_c - want_c) < 1e-9


def test_trainer_ema_tracks_and_swaps():
    """state.ema follows ``ema += m*(p - ema)`` per step; ema_swapped is
    the hook's checkpoint/eval swap and an involution."""
    import optax

    from iif_tpu.detection import build_detector
    from iif_tpu.detection.single_stage import SSTrainCfg
    from iif_tpu.engine.detection import DetectionTrainer, ema_swapped
    from iif_tpu.parallel.mesh import make_mesh

    model, _, _ = build_detector({"type": "YOLOX", "num_classes": 3})
    trainer = DetectionTrainer(
        model, None, optax.sgd(1e-2), make_mesh(), train_cfg=SSTrainCfg(),
        # warm_up=0 degenerates mmcv's min(m, (1+x)/(warm_up+x)) ramp to
        # the raw constant, keeping the hand-EMA below exact
        ema_cfg={"momentum": 0.25, "mode": "const", "warm_up": 0})
    state0 = trainer.init_state((H, W, 3))
    assert state0.ema is not None
    batch = _demo_batch(np.random.RandomState(1))
    p0 = jax.device_get(state0.params)
    state1, _ = trainer._train_step(state0, batch)
    # read BEFORE the next step: the train step donates its input state,
    # so state1's buffers are dead after the second call
    p1 = jax.device_get(state1.params)
    state2, _ = trainer._train_step(state1, batch)
    p2 = jax.device_get(state2.params)
    # hand EMA: e0 = p0; e1 = e0 + .25(p1-e0); e2 = e1 + .25(p2-e1)
    e = jax.tree_util.tree_map(lambda a: a, p0)
    for p in (p1, p2):
        e = jax.tree_util.tree_map(lambda ev, pv: ev + 0.25 * (pv - ev),
                                   e, p)
    got = jax.device_get(state2.ema["params"])
    jax.tree_util.tree_map(
        lambda va, vb: np.testing.assert_allclose(vb, va, rtol=2e-5,
                                                  atol=1e-6), e, got)
    # swap: public weights are the EMA, raw preserved; involution
    pub = ema_swapped(state2)
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(jax.device_get(pub.params))[0],
        jax.tree_util.tree_leaves(got)[0], rtol=1e-6)
    back = ema_swapped(pub)
    np.testing.assert_allclose(
        jax.tree_util.tree_leaves(jax.device_get(back.params))[0],
        jax.tree_util.tree_leaves(p2)[0], rtol=1e-6)


# ------------------------------------------------- n/a-by-construction
def test_sync_random_size_deterministic_across_hosts(tmp_path):
    """SyncRandomSizeHook broadcasts the random input size from rank 0
    (sync_random_size_hook.py) — our DetectionLoader derives per-step
    scale/bucket choices from RandomState(seed + epoch), so two loaders
    (i.e. two hosts) with the same seed/epoch produce the identical
    per-step canvas/scale schedule without any broadcast."""
    import json

    import cv2

    from iif_tpu.detection.datasets import CocoStyleDataset
    from iif_tpu.detection.pipeline import (DetectionLoader,
                                            DetectionPipeline)

    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(8):
        cv2.imwrite(str(tmp_path / f"{i}.jpg"),
                    rng.randint(0, 255, (48, 64, 3), np.uint8))
        images.append({"id": i, "file_name": f"{i}.jpg",
                       "width": 64, "height": 48})
        anns.append({"id": i + 1, "image_id": i, "category_id": 1,
                     "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0,
                     "segmentation": [[5, 5, 25, 5, 25, 25, 5, 25]]})
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps({
        "categories": [{"id": 1, "name": "cat"}],
        "images": images, "annotations": anns}))

    def _schedule():
        ds = CocoStyleDataset(str(ann_path), img_prefix=str(tmp_path))
        pipe = DetectionPipeline(
            canvas=(256, 320), max_gt=4, canvas_buckets=True,
            scales=[(320, 160), (320, 192), (320, 256)])
        loader = DetectionLoader(ds, pipe, batch_size=2, seed=11,
                                 num_workers=2, prefetch=0)
        sched = []
        for epoch in range(3):
            loader.set_epoch(epoch)
            for batch in loader:
                sched.append((batch["image"].shape,
                              np.asarray(batch["scale_factor"]).copy()))
        return sched

    a, b = _schedule(), _schedule()
    assert len(a) == len(b) and len(a) >= 9
    shapes = set()
    for (sa, fa), (sb, fb) in zip(a, b):
        assert sa == sb
        np.testing.assert_array_equal(fa, fb)
        shapes.add(sa)
    assert len(shapes) >= 2  # the size actually varies across steps
