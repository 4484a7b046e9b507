"""Detection training CLI — rebuild of the reference's
``instance_segmentation/tools/train.py`` (config file + --cfg-options,
selectp decoupled finetuning, resume/load-from) on the TPU-native stack.

Usage::

    python -m iif_tpu.cli.train_det configs/iif/iif_r50_1x.py \
        --work-dir runs/iif_r50 [--cfg-options data.samples_per_gpu=8]
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Any, Dict, Optional

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume-from", default=None)
    p.add_argument("--load-from", default=None)
    p.add_argument("--selectp", default=0, type=int,
                   help="decoupled finetune: 1=fc_cls 2=bbox head "
                        "3=cascade fc_cls 4=bbox+mask heads")
    p.add_argument("--seed", default=None, type=int)
    p.add_argument("--cfg-options", nargs="+", default=[])
    p.add_argument("--max-steps", default=None, type=int,
                   help="cap train steps per epoch (smoke runs)")
    p.add_argument("--tp", default=None, type=int,
                   help="tensor-parallel degree: mesh (data, model=tp); "
                        "heads sharded over 'model' (detection_tp_rules)")
    return p.parse_args()


def build_loss_cls(cfg_loss: Dict[str, Any], dataset, num_classes: int):
    import jax.numpy as jnp

    from iif_tpu.detection.losses import (
        DetCrossEntropyLoss,
        DetIIFLoss,
        compute_det_iif_from_counts,
        load_iif_csv,
    )

    t = cfg_loss.get("type", "DetCrossEntropyLoss")
    if t == "DetIIFLoss":
        path = cfg_loss.get("path")
        variant = cfg_loss.get("variant", "raw")
        if path:
            w = load_iif_csv(path, variant)
        elif variant.endswith("_obj"):
            counts = dataset.class_instance_counts()
            w = compute_det_iif_from_counts(counts, int(counts.sum()),
                                            variant)
        else:
            # N = image corpus size (pre-filter), NOT sum of per-class
            # image counts — idf_1204.csv semantics (N=100170 for LVIS v1)
            counts = dataset.class_image_counts()
            total = getattr(dataset, "num_images_total", len(dataset))
            w = compute_det_iif_from_counts(counts, total, variant)
        assert len(w) == num_classes + 1, (len(w), num_classes)
        return DetIIFLoss(weights=jnp.asarray(w))
    if t == "SeesawLoss":
        from iif_tpu.detection.losses_extra import SeesawLoss

        return SeesawLoss(
            cum_samples=jnp.zeros(num_classes + 1, jnp.float32),
            p=cfg_loss.get("p", 0.8), q=cfg_loss.get("q", 2.0),
            eps=cfg_loss.get("eps", 1e-2),
            loss_weight=cfg_loss.get("loss_weight", 1.0))
    return DetCrossEntropyLoss(num_classes=num_classes,
                               use_sigmoid=cfg_loss.get("use_sigmoid",
                                                        False))


def fasa_train_fallback(loader, n_batches: int = 50):
    """Capped-train fallback for the FASA DynamicRunner when no data.val
    split is configured. Warns loudly: the adaptive-sampling signal flips
    from val loss to train loss vs the reference workflow
    (``tools/train.py`` builds ``[('train',1),('val',1)]`` with the val
    split run through the train pipeline)."""
    import warnings

    warnings.warn(
        "FASA DynamicRunner: no data.val split configured — falling "
        "back to a 50-batch slice of the TRAIN loader for the "
        "dynamic-sampling pass. This changes the algorithm: the "
        "adaptive signal comes from train loss instead of val loss "
        "(reference workflow [('train',1),('val',1)] uses the val "
        "split). Configure data.val to match the reference.",
        UserWarning, stacklevel=2)
    return _capped(loader, n_batches)


def main():
    from iif_tpu.utils.compile_cache import enable as _enable_xla_cache
    _enable_xla_cache()

    args = parse_args()
    import jax
    import jax.numpy as jnp

    from iif_tpu.config import Config, parse_cfg_options
    from iif_tpu.detection.datasets import DATASETS
    from iif_tpu.detection.detector import DetTrainCfg
    from iif_tpu.detection.fasa import init_fasa_state
    from iif_tpu.detection.pipeline import DetectionLoader, DetectionPipeline
    from iif_tpu.engine.detection import DetectionTrainer, selectp_mask
    from iif_tpu.engine.schedules import build_lr_schedule, build_optimizer
    from iif_tpu.parallel import initialize_distributed, is_main_process, make_mesh
    from iif_tpu.utils.checkpoint import CheckpointManager

    cfg = Config.fromfile(args.config)
    cfg.merge_from_options(parse_cfg_options(args.cfg_options))
    work_dir = args.work_dir or os.path.join(
        "work_dirs", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(os.path.join(work_dir, "config_dump.py"))

    initialize_distributed()
    tp = args.tp or cfg.get("parallel", {}).get("tp", 1)
    mesh = make_mesh(model=tp)
    seed = args.seed if args.seed is not None else cfg.get("seed", 0)

    # ------------------------------------------------------------------ data
    dcfg = cfg.data
    train_ds = DATASETS.build({k: v for k, v in dcfg["train"].items()
                               if k != "oversample_thr"})
    pcfg = cfg.get("pipeline", {})
    from iif_tpu.detection.pipeline import build_extra_transforms

    pipeline = DetectionPipeline(
        canvas=tuple(pcfg.get("canvas", (800, 1344))),
        scales=[tuple(s) for s in pcfg.get("scales", [(1333, 800)])],
        flip_prob=pcfg.get("flip_prob", 0.5),
        max_gt=pcfg.get("max_gt", 100),
        with_mask=cfg.model.get("with_mask", True),
        mask_stride=pcfg.get("mask_stride", 1),
        extra_transforms=build_extra_transforms(pcfg.get("extras", [])),
        canvas_buckets=pcfg.get("canvas_buckets", False),
        # default ON: uint8 canvas + bit-packed masks -> ~7x less
        # host->device traffic; normalization/unpack run on device
        emit_uint8=pcfg.get("uint8", True),
        pack_masks=pcfg.get("pack_masks", True),
        keep_ratio=pcfg.get("keep_ratio", True),
        with_seg=pcfg.get("with_seg", False),
        seg_stride=pcfg.get("seg_stride", 4),
        # FastRCNN: precomputed proposals from data.train.proposal_file,
        # padded to this static cap (reference LoadProposals)
        max_proposals=pcfg.get(
            "max_proposals",
            512 if not cfg.model.get("with_rpn", True) else 0))
    loader = DetectionLoader(
        train_ds, pipeline, batch_size=dcfg.get("samples_per_gpu", 4)
        * mesh.shape["data"],   # global batch = per-DP-shard x data axis
        oversample_thr=dcfg["train"].get("oversample_thr", 0.0), seed=seed)

    num_classes = cfg.model["num_classes"]
    # NumClassCheckHook equivalent (reference mmdet/datasets/utils.py:116)
    if len(train_ds.CLASSES) != num_classes:
        raise ValueError(
            f"model.num_classes={num_classes} != dataset classes "
            f"{len(train_ds.CLASSES)} ({cfg.data['train'].get('ann_file')})")
    loss_cls = build_loss_cls(cfg.loss_cls, train_ds, num_classes)

    # ----------------------------------------------------------------- model
    from iif_tpu.detection import build_detector

    if cfg.loss_cls.get("type") == "SeesawLoss":
        # custom-cls-channels protocol: Seesaw's classifier emits C+2
        cfg.model.setdefault("cls_channels", num_classes + 2)
    mtype = cfg.model.get("type", "MaskRCNN")
    pretrained_backbone = cfg.model.pop("pretrained_backbone", None)
    if cfg.model.get("cls_predictor") == "iif_normed":
        # thread the dataset-derived IIF vector into the head (the
        # reference pre-multiplies fc_cls weights by IIF,
        # normed_predictor.py IIFNormedLinear)
        import numpy as _np

        cfg.model["iif_weights"] = tuple(
            float(x) for x in _np.asarray(loss_cls.weights))
    model, train_cfg_cls, _ = build_detector(cfg.model)

    tc = dict(cfg.get("train_cfg", {}))
    if train_cfg_cls is DetTrainCfg:
        tc.setdefault("mask_gt_stride", pcfg.get("mask_stride", 1))
    train_cfg = train_cfg_cls(**tc)
    ocfg = cfg.optimizer
    steps_per_epoch = max(len(loader), 1)
    max_epochs = cfg.runner["max_epochs"]
    lcfg = cfg.get("lr_config", {})
    if str(lcfg.get("policy", "")).lower() == "yolox":
        # YOLOXLrUpdaterHook: quadratic warmup + cosine + fixed-LR
        # no-aug tail (warmup_iters is in EPOCHS — warmup_by_epoch=True
        # in the reference yolox configs)
        from iif_tpu.engine.schedules import build_yolox_lr_schedule
        schedule = build_yolox_lr_schedule(
            ocfg["lr"], steps_per_epoch, max_epochs,
            num_last_epochs=lcfg.get("num_last_epochs", 15),
            warmup_epochs=lcfg.get("warmup_iters", 5),
            warmup_ratio=lcfg.get("warmup_ratio", 1.0),
            min_lr_ratio=lcfg.get("min_lr_ratio", 0.05))
    else:
        schedule = build_lr_schedule(
            ocfg["lr"], steps_per_epoch, max_epochs,
            milestones=lcfg.get("milestones", []),
            lr_gamma=lcfg.get("gamma", 0.1),
            warmup_iters=lcfg.get("warmup_iters"),
            warmup_factor=lcfg.get("warmup_factor", 1.0 / 1000))
    # YOLOXModeSwitchHook (custom_hooks): close Mosaic/RandomAffine/MixUp
    # and add the L1 loss for the last num_last_epochs epochs
    mode_switch = None
    ema_cfg = None
    _EMA_MODES = {"EMAHook": "const", "ExpMomentumEMAHook": "exp",
                  "LinearMomentumEMAHook": "linear"}
    for hk in cfg.get("custom_hooks", []) or []:
        if hk.get("type") == "YOLOXModeSwitchHook":
            mode_switch = dict(
                num_last_epochs=hk.get("num_last_epochs", 15),
                skip_type_keys=tuple(hk.get(
                    "skip_type_keys", ("Mosaic", "RandomAffine", "MixUp"))))
        elif hk.get("type") in _EMA_MODES:
            # EMA hook family (mmdet core/hook/ema.py)
            ema_cfg = {k: v for k, v in hk.items()
                       if k not in ("type", "priority", "resume_from")}
            ema_cfg["mode"] = _EMA_MODES[hk["type"]]
    grad_clip = cfg.get("optimizer_config", {}).get(
        "grad_clip", {}) or {}
    pw = ocfg.get("paramwise_cfg", {}) or {}
    from iif_tpu.engine.schedules import norm_decay_mask
    tx = build_optimizer(ocfg.get("type", "sgd"), schedule,
                         ocfg.get("momentum", 0.9),
                         ocfg.get("weight_decay", 1e-4),
                         grad_clip=grad_clip.get("max_norm"),
                         decay_mask=(norm_decay_mask
                                     if pw.get("norm_decay_mult") == 0.0
                                     else None))

    fasa_cfg = cfg.get("fasa_cfg")
    fasa_state = None
    if fasa_cfg is not None:
        inst_counts = train_ds.class_instance_counts()
        fasa_state = init_fasa_state(
            np.maximum(inst_counts, 1), feat_dim=1024,
            instance_prob_power=fasa_cfg.get("instance_prob_power", 1.0),
            instance_prob_scale=fasa_cfg.get("instance_prob_scale", 1.0))
        if mtype == "CascadeMaskRCNN":
            # one independent FASA head per cascade stage (reference:
            # per-stage Shared2FCFASABBoxHead buffers). Copies, not
            # aliases: the donated train step must see distinct buffers.
            import jax as _jax
            import jax.numpy as _jnp

            fasa_state = tuple(
                _jax.tree_util.tree_map(_jnp.copy, fasa_state)
                for _ in range(model.num_stages))

    from iif_tpu.parallel import detection_tp_rules

    # LD: build + restore the frozen GFL teacher (configs/ld,
    # kd_one_stage.py builds the teacher from teacher_config/teacher_ckpt)
    teacher = None
    if mtype == "LD":
        import jax as _jax
        import jax.numpy as _jnp

        from iif_tpu.detection.gfl import GFL

        tmodel = GFL(num_classes=num_classes,
                     depth=cfg.model.get("teacher_depth", 101),
                     compute_dtype=cfg.model.get("compute_dtype"))
        tvars = _jax.jit(tmodel.init, static_argnums=2)(
            _jax.random.PRNGKey(0),
            _jnp.zeros((1,) + tuple(pipeline.canvas) + (3,),
                       _jnp.float32), False)
        tckpt = cfg.model.get("teacher_ckpt")
        if tckpt:
            from iif_tpu.utils.checkpoint import load_weights

            tvars = load_weights(tckpt, template=tvars)
        teacher = (tmodel, tvars)

    # grad_accum k: the global batch is split into k sequential
    # micro-batches inside one jitted step (reaches the reference's
    # global batch when it exceeds per-chip HBM, e.g. cascade R101 b8)
    trainer = DetectionTrainer(model, loss_cls, tx, mesh, train_cfg,
                               fasa_cfg=fasa_cfg, seed=seed,
                               param_rules=(detection_tp_rules()
                                            if tp > 1 else None),
                               grad_accum=dcfg.get("grad_accum", 1),
                               teacher=teacher, ema_cfg=ema_cfg)
    canvas = pipeline.canvas
    state = trainer.init_state((canvas[0], canvas[1], 3),
                               fasa_state=fasa_state, seed=seed)

    # trainable mask: frozen backbone stages (requires_grad=False in the
    # reference — no grad, no weight decay) AND the selectp decoup switch
    from iif_tpu.engine.detection import combine_masks, frozen_backbone_mask

    mask = frozen_backbone_mask(state.params,
                                getattr(model, "frozen_stages", -1))
    if args.selectp:
        mask = combine_masks(mask, selectp_mask(state.params, args.selectp))
    if not all(jax.tree_util.tree_leaves(mask)):
        tx = build_optimizer(ocfg.get("type", "sgd"), schedule,
                             ocfg.get("momentum", 0.9),
                             ocfg.get("weight_decay", 1e-4),
                             trainable_mask=mask,
                             grad_clip=grad_clip.get("max_norm"),
                             decay_mask=(norm_decay_mask
                                         if pw.get("norm_decay_mult") == 0.0
                                         else None))
        trainer.tx = tx
        state = state.replace(opt_state=tx.init(state.params))

    if pretrained_backbone:
        # reference init_cfg=dict(type='Pretrained', prefix='backbone.')
        # (rsb recipe) or torchvision:// backbones: overlay a converted
        # torch ResNet checkpoint onto the detector backbone
        from iif_tpu.models.pretrained import (load_torch_checkpoint,
                                               merge_pretrained)

        bb_p, bb_bs = load_torch_checkpoint(pretrained_backbone,
                                            prefix="backbone.")
        merged = merge_pretrained(
            {"params": state.params["backbone"],
             "batch_stats": (state.batch_stats or {}).get("backbone", {})},
            bb_p, bb_bs)
        from iif_tpu.parallel.mesh import replicated

        # put only the overlaid backbone leaves, with the same replicated
        # NamedSharding init_state used — a bare device_put would land them
        # uncommitted on the default device, forcing jit to re-shard every
        # step and defeating buffer donation for those leaves
        new_params = dict(state.params)
        new_params["backbone"] = jax.device_put(merged["params"],
                                                replicated(mesh))
        new_bs = dict(state.batch_stats or {})
        new_bs["backbone"] = jax.device_put(
            merged.get("batch_stats", new_bs.get("backbone", {})),
            replicated(mesh))
        state = state.replace(params=new_params, batch_stats=new_bs)

    mngr = CheckpointManager(os.path.join(work_dir, "checkpoints"))
    start_epoch = 0
    resumed = bool(args.resume_from or cfg.get("resume_from"))
    if resumed:
        # Orbax restores plain dicts without a template — resume must
        # restore onto the live DetTrainState topology (opt_state holds
        # optax namedtuples that a dict restore would corrupt). The
        # checkpoint may disagree with the config about the ema field
        # (hook added or dropped between runs): try the current
        # topology first, then the other ema layout.
        def _try_restore(tmpl_state):
            return mngr.restore(
                template={"state": jax.device_get(tmpl_state), "epoch": 0})

        try:
            restored = _try_restore(state)
        except Exception as first_err:
            # Alternate ema layouts. With ema on: the checkpoint may lack
            # the shadow. With ema off: the checkpoint may carry one (hook
            # dropped between runs) — build the template directly from the
            # live weights (NOT trainer._ema_init, which returns None when
            # the current config has no hook), in both the full and the
            # skip_buffers (batch_stats-free) layouts.
            if state.ema is not None:
                alts = [state.replace(ema=None)]
            else:
                alts = [
                    state.replace(ema={
                        "params": state.params,
                        "batch_stats": state.batch_stats or {}}),
                    state.replace(ema={"params": state.params}),
                ]
            restored = None
            for alt in alts:
                try:
                    restored = _try_restore(alt)
                    break
                except Exception:
                    continue
            if restored is None:
                raise RuntimeError(
                    "resume restore failed under both the live and the "
                    "alternate EMA checkpoint layouts; the original "
                    "(live-layout) error is chained below") from first_err
        state = jax.device_put(restored["state"])
        start_epoch = int(restored["epoch"]) + 1
        if getattr(state, "ema", None) is not None:
            # checkpoints hold the EMA-swapped layout (see save below);
            # swap back so training resumes on the raw weights — the
            # hook's before_train_epoch swap (ema.py:91-94). Done even
            # when the current config dropped the EMA hook: otherwise the
            # run would silently keep training on the EMA weights.
            from iif_tpu.engine.detection import ema_swapped
            state = ema_swapped(state)
            if ema_cfg is None:
                # hook dropped from the config: discard the stale shadow
                # so eval/checkpoint swaps don't reinstate it
                state = state.replace(ema=None)
        elif ema_cfg is not None:
            import warnings

            warnings.warn(
                "resume checkpoint has no EMA state but the config "
                "enables an EMA hook; reinitializing the EMA shadow from "
                "the restored weights", RuntimeWarning)
            state = state.replace(
                ema=trainer._ema_init(state.params, state.batch_stats))
    if args.load_from or cfg.get("load_from"):
        from iif_tpu.utils.checkpoint import load_weights

        w = load_weights(args.load_from or cfg.get("load_from"))
        state = state.replace(params=jax.device_put(w["state"]["params"]),
                              batch_stats=jax.device_put(
                                  w["state"]["batch_stats"]))
    if ema_cfg is not None and not resumed and (
            args.load_from or cfg.get("load_from") or pretrained_backbone):
        # BaseEMAHook.before_run clones the shadow from the ALREADY-LOADED
        # model (ema.py:58-65) — rebuild it from the loaded weights, not
        # the random init that init_state copied
        state = state.replace(
            ema=trainer._ema_init(state.params, state.batch_stats))

    # log_config hooks: .log.json always, TensorBoard when configured
    # (reference log_config hooks = [TextLoggerHook, TensorboardLoggerHook])
    log_writer = None
    if is_main_process():
        from iif_tpu.utils.logging import TrainLogWriter

        log_writer = TrainLogWriter(
            work_dir,
            tensorboard=cfg.get("log_config", {}).get("tensorboard", True))
        log_writer.write_env_header(
            exp_name=os.path.basename(args.config),
            seed=cfg.get("seed"))

    dynamic = cfg.runner.get("type") == "EpochBasedDynamicRunner"
    fasa_val_loader = None
    if dynamic and fasa_state is not None:
        # the DynamicRunner val pass iterates the VAL dataset through the
        # TRAIN pipeline (reference tools/train.py builds the workflow-val
        # dataset with cfg.data.train.pipeline); fall back to a capped
        # slice of the train loader only when no val split is configured
        if "val" in dcfg:
            fasa_val_ds = DATASETS.build(
                {k: v for k, v in dcfg["val"].items()
                 if k != "oversample_thr"})
            fasa_val_loader = DetectionLoader(
                fasa_val_ds, pipeline,
                batch_size=dcfg.get("samples_per_gpu", 4)
                * mesh.devices.size, oversample_thr=0.0, seed=seed)
        else:
            fasa_val_loader = fasa_train_fallback(loader)
    eval_cfg = cfg.get("evaluation", {})
    eval_interval = eval_cfg.get("interval", 0)
    print(f"Start training: {max_epochs} epochs, "
          f"{steps_per_epoch} steps/epoch, dynamic={dynamic}")
    noaug_announced = False
    for epoch in range(start_epoch, max_epochs):
        if args.max_steps:
            loader_iter = _capped(loader, args.max_steps)
        else:
            loader_iter = loader
        # YOLOXModeSwitchHook.before_train_epoch (fires when
        # epoch+1 == max_epochs - num_last_epochs; >= keeps resumed runs
        # inside the phase correct)
        use_l1 = False
        if mode_switch is not None and (
                epoch + 1 >= max_epochs - mode_switch["num_last_epochs"]):
            use_l1 = True
            pipeline.update_skip_type_keys(mode_switch["skip_type_keys"])
            if not noaug_announced:
                print("No mosaic and mixup aug now! "
                      "Add additional L1 loss now!")
                noaug_announced = True
        state, logger = trainer.train_one_epoch(
            state, loader_iter, epoch,
            print_freq=cfg.get("log_config", {}).get("interval", 50),
            log_writer=log_writer, lr_fn=schedule, use_l1=use_l1)
        if dynamic and state.fasa is not None:
            vloader = (_capped(fasa_val_loader, args.max_steps)
                       if args.max_steps else fasa_val_loader)
            state = trainer.fasa_val_epoch(state, vloader)
            if log_writer is not None:
                # FASA sampling probs to TB (dynamic_runner.py:31-34)
                fasa = state.fasa if isinstance(state.fasa, tuple) \
                    else (state.fasa,)
                for si, fs in enumerate(fasa):
                    log_writer.add_histogram(
                        f"fasa/prob_list_s{si}",
                        np.asarray(fs.prob_list), epoch)
        # EMAHook.after_train_epoch swaps the EMA weights in before
        # EvalHook/CheckpointHook see the state (ema.py:86-89) — so
        # checkpoints and eval use the EMA weights, with the raw weights
        # preserved in the ema field
        from iif_tpu.engine.detection import ema_swapped
        public_state = ema_swapped(state)
        ckpt_interval = cfg.get("checkpoint_config", {}).get("interval", 1)
        if is_main_process() and (
                (epoch + 1) % ckpt_interval == 0 or epoch == max_epochs - 1):
            mngr.save(epoch, {"state": jax.device_get(public_state),
                              "epoch": epoch})
        # EvalHook equivalent (reference core/evaluation/eval_hooks.py)
        if eval_interval and (epoch + 1) % eval_interval == 0:
            _run_eval(cfg, model, public_state, loss_cls, pipeline,
                      eval_cfg.get("metric", ["bbox"]))
    if log_writer is not None:
        log_writer.close()
    print("done")


def _run_eval(cfg, model, state, loss_cls, pipeline, metrics):
    import jax

    from iif_tpu.cli.test_det import _EvalLoader, run_inference
    from iif_tpu.detection import build_detector
    from iif_tpu.detection.datasets import DATASETS
    from iif_tpu.detection.evaluation import DetEvaluator

    _, _, test_cfg_cls = build_detector(dict(cfg.model))
    val_ds = DATASETS.build({k: v for k, v in cfg.data["val"].items()
                             if k != "oversample_thr"})
    loader = _EvalLoader(val_ds, pipeline,
                         cfg.data.get("samples_per_gpu", 4),
                         num_shards=jax.process_count(),
                         shard_id=jax.process_index())
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    results = run_inference(
        model, variables, loader, loss_cls,
        test_cfg_cls(**cfg.get("test_cfg", {})), val_ds.cat_ids,
        cfg.model.get("with_mask", True))
    if jax.process_count() > 1:
        from iif_tpu.parallel import gather_objects, is_main_process

        parts = gather_objects(results)
        if not is_main_process():
            return
        results = [r for part in parts for r in part]
    gt_anns = [a for rec in val_ds.img_infos for a in rec["anns"]]
    ev = DetEvaluator(val_ds.img_infos, gt_anns, val_ds.cat_ids,
                      lvis=val_ds.lvis_style,
                      cat_image_counts=val_ds.cat_image_counts,
                      cat_frequency=getattr(val_ds, "cat_frequency", None),
                      max_dets=cfg.get("test_cfg", {}).get("max_per_img",
                                                           100))
    for m in metrics:
        res = ev.evaluate(results, "segm" if m == "segm" else "bbox")
        print("eval", m, {k: round(v, 4) for k, v in res.items()})


class _capped:
    def __init__(self, loader, n):
        self.loader = loader
        self.n = n

    def __len__(self):
        return min(len(self.loader), self.n)

    def set_epoch(self, e):
        self.loader.set_epoch(e)

    def __iter__(self):
        for i, b in enumerate(self.loader):
            if i >= self.n:
                break
            yield b


if __name__ == "__main__":
    main()
