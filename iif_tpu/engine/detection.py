"""Detection trainer — the runner layer for MaskRCNN/Cascade training.

Rebuild of mmcv ``EpochBasedRunner`` + the fork's
``EpochBasedDynamicRunner`` (``mmdet/apis/epoch_based_dynamic_runner.py``):
epoch loop, checkpoint/eval hooks, and the FASA protocol — each train
epoch pushes the epoch index into the loss (aug term active from epoch>=1),
and after each val pass the cum-loss counters drive
``fasa_dynamic_sampling`` (host-side clustering) before the next epoch.
The reference's ``dist.barrier()+sleep`` deadlock dance disappears:
single-controller SPMD has no divergent-graph hazard.

Also ports the decoupled-training switches (``selectp``,
``instance_segmentation/tools/train.py:87-128``) as optax masks.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from iif_tpu.detection.cascade import CascadeMaskRCNN, cascade_loss
from iif_tpu.detection.detector import (
    DetTrainCfg,
    MaskRCNN,
    maskrcnn_loss,
    maskrcnn_simple_test,
)
from iif_tpu.detection.fasa import (
    FasaState,
    fasa_accumulate_val,
    fasa_dynamic_sampling,
)
from iif_tpu.parallel.mesh import replicated, shard_batch
from iif_tpu.utils.metrics import MetricLogger


class DetTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    fasa: Optional[FasaState] = None
    # SeesawLoss per-class cumulative sample counters (C+1,) — the
    # reference's mutable buffer (seesaw_loss.py:127-130) as train state
    seesaw_cum: Optional[jnp.ndarray] = None
    # Dynamic R-CNN adaptive IoU/beta state (dynamic_roi_head.py's
    # iou_history/beta_history python lists as device ring buffers)
    dynamic: Optional[Any] = None
    # EMA shadow weights (mmdet core/hook/ema.py): {"params": ...} and,
    # unless skip_buffers, {"batch_stats": ...}. None = EMA disabled.
    ema: Optional[Any] = None


def ema_momentum(ema_cfg: Dict[str, Any], step) -> jnp.ndarray:
    """Per-step EMA momentum. ``step`` is the 0-based iter the update
    follows (the hook's ``runner.iter``).

    - ``exp``: mmdet ExpMomentumEMAHook (ema.py:108-113),
      ``(1-m)*exp(-(1+x)/total_iter)+m``.
    - ``linear``: mmdet LinearMomentumEMAHook (ema.py:116-124),
      ``min(m**interval, (1+x)/(warm_up+x))``.
    - ``const``: mmcv's plain ``EMAHook`` (mmcv runner/hooks/ema.py),
      which is NOT a raw constant — it pre-raises ``m**interval`` and
      applies the same ``min(., (1+x)/(warm_up+x))`` early ramp as the
      linear hook, so a config naming ``EMAHook`` gets mmcv's
      slow-starting semantics here too.
    """
    m = float(ema_cfg.get("momentum", 0.0002))
    mode = ema_cfg.get("mode", "const")
    step = jnp.asarray(step, jnp.float32)
    if mode == "exp":
        return (1.0 - m) * jnp.exp(
            -(1.0 + step) / float(ema_cfg.get("total_iter", 2000))) + m
    wu = float(ema_cfg.get("warm_up", 100))
    return jnp.minimum(m ** int(ema_cfg.get("interval", 1)),
                       (1.0 + step) / (wu + step))


def ema_swapped(state: DetTrainState) -> DetTrainState:
    """The hook's ``_swap_ema_parameters`` (ema.py:96-103): live weights
    <-> EMA backup. mmdet swaps after every train epoch so EvalHook and
    CheckpointHook see the EMA weights ("the original model parameters
    are actually saved in ema field"), then swaps back before the next
    epoch — an involution; callers apply it around eval/checkpoint."""
    if state.ema is None:
        return state
    e = dict(state.ema)
    raw = {"params": state.params}
    new_bs = state.batch_stats
    if "batch_stats" in e:
        raw["batch_stats"] = state.batch_stats
        new_bs = e["batch_stats"]
    return state.replace(params=e["params"], batch_stats=new_bs, ema=raw)


class DetectionTrainer:
    def __init__(
        self,
        model: MaskRCNN,
        loss_cls,
        tx: optax.GradientTransformation,
        mesh: Mesh,
        train_cfg: DetTrainCfg = DetTrainCfg(),
        fasa_cfg: Optional[Dict[str, float]] = None,
        seed: int = 0,
        param_rules=None,
        grad_accum: int = 1,
        teacher=None,   # (GFL model, frozen variables) -> LD training
        ema_cfg: Optional[Dict[str, Any]] = None,
    ):
        from iif_tpu.detection.detr import DETR
        from iif_tpu.detection.rpn_detector import RPNDetector
        from iif_tpu.detection.single_stage import _SingleStageBase
        from iif_tpu.detection.trident import TridentFasterRCNN

        from iif_tpu.detection.htc import HTC
        from iif_tpu.detection.scnet import SCNet

        from iif_tpu.detection.losses_extra import SeesawLoss

        self.model = model
        self.loss_cls = loss_cls
        self.is_seesaw = isinstance(loss_cls, SeesawLoss)
        self.is_htc = isinstance(model, HTC)
        self.is_scnet = isinstance(model, SCNet)
        self.is_cascade = isinstance(model, CascadeMaskRCNN)
        self.is_single_stage = isinstance(model, _SingleStageBase)
        self.is_detr = isinstance(model, DETR)
        from iif_tpu.detection.cascade_rpn import CascadeRPN

        self.is_cascade_rpn = isinstance(model, CascadeRPN)
        self.is_rpn_only = isinstance(model, RPNDetector)
        self.teacher_model, self.teacher_vars = teacher or (None, None)
        self.is_trident = isinstance(model, TridentFasterRCNN)
        from iif_tpu.detection.c4 import C4FasterRCNN

        self.is_c4 = isinstance(model, C4FasterRCNN)
        # cascade stages share one loss object unless per-stage losses are
        # given (the reference builds one FasaIIFLoss per stage from the
        # same CSV — identical weights, so sharing is equivalent)
        if self.is_cascade and not isinstance(loss_cls, (tuple, list)):
            self.stage_losses = (loss_cls,) * model.num_stages
        elif self.is_cascade:
            self.stage_losses = tuple(loss_cls)
        self.tx = tx
        self.mesh = mesh
        self.train_cfg = train_cfg
        self.fasa_cfg = fasa_cfg
        # tensor-parallel placement rules (e.g. detection_tp_rules()):
        # params + optimizer state sharded over the mesh 'model' axis,
        # everything else replicated; XLA inserts the head collectives
        self.param_rules = param_rules
        # micro-batching: split each global batch into ``grad_accum``
        # sequential chunks inside ONE jitted step (lax.scan) and apply
        # the averaged gradient — reaches the reference's global batch
        # when the full batch exceeds per-chip HBM (e.g. cascade R101
        # b8 = 2 x b4; VERDICT round-2 item 4). Peak activation memory
        # is one chunk's; the only extra residency is a params-sized
        # gradient accumulator.
        self.grad_accum = int(grad_accum)
        # EMA config (custom_hooks EMAHook family): {"momentum", "mode":
        # const|exp|linear, "interval", "skip_buffers", "total_iter",
        # "warm_up"}; None disables (no ema leaf in the train state)
        self.ema_cfg = ema_cfg
        self.base_rng = jax.random.PRNGKey(seed)
        # NOTE: the only epoch-dependent behaviour is the FASA aug gate
        # (active from epoch >= 1); a static boolean keeps it to at most
        # two compiled variants instead of a recompile per epoch.
        # use_l1 is the YOLOXModeSwitchHook's L1-phase flag (reference
        # yolox_mode_switch_hook.py:38 sets bbox_head.use_l1 at epoch
        # max_epochs - num_last_epochs); static -> one extra compiled
        # variant when the phase flips, served by the persistent cache.
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,),
                                   static_argnames=("fasa_aug_on",
                                                    "use_l1"))

    def _ema_init(self, params, batch_stats):
        """EMA buffers start as a copy of the live weights
        (ema.py:55-63 ``register_buffer(..., value.data.clone())``).
        A genuine copy, not an alias: the donated train step would
        otherwise receive the same buffer twice (params and ema) and
        abort with a double-donation error."""
        if self.ema_cfg is None:
            return None
        ema = {"params": jax.tree_util.tree_map(jnp.copy, params)}
        if not self.ema_cfg.get("skip_buffers", False):
            ema["batch_stats"] = jax.tree_util.tree_map(jnp.copy,
                                                        batch_stats)
        return ema

    def _dynamic_init(self):
        """Algorithm-state leaf: Dynamic R-CNN's adaptive thresholds or
        GHM's momentum histograms, depending on the config."""
        if getattr(self.train_cfg, "rcnn_dynamic", False):
            from iif_tpu.detection.dynamic_rcnn import dynamic_rcnn_init

            return dynamic_rcnn_init(
                initial_iou=self.train_cfg.dynamic_initial_iou,
                initial_beta=self.train_cfg.dynamic_initial_beta,
                interval=self.train_cfg.dynamic_interval)
        if getattr(self.train_cfg, "loss_kind", "focal") == "ghm":
            from iif_tpu.detection.single_stage import ghm_state_init

            return ghm_state_init(self.train_cfg)
        return None

    def init_state(self, sample_shape, fasa_state: Optional[FasaState] = None,
                   seed: int = 0) -> DetTrainState:
        if self.is_detr:
            # DETR's forward takes (images, img_shape, train)
            variables = jax.jit(self.model.init, static_argnums=(3,))(
                jax.random.PRNGKey(seed),
                jnp.zeros((1,) + tuple(sample_shape), jnp.float32),
                jnp.asarray([[sample_shape[0], sample_shape[1]]],
                            jnp.int32), False)
        else:
            variables = jax.jit(self.model.init, static_argnums=(2,))(
                jax.random.PRNGKey(seed),
                jnp.zeros((1,) + tuple(sample_shape), jnp.float32), False)
        params = variables["params"]
        state = jax.device_put(
            DetTrainState(
                step=jnp.zeros((), jnp.int32), params=params,
                batch_stats=variables.get("batch_stats", {}),
                opt_state=self.tx.init(params), fasa=fasa_state,
                seesaw_cum=(self.loss_cls.cum_samples
                            if self.is_seesaw else None),
                dynamic=self._dynamic_init(),
                ema=self._ema_init(params,
                                   variables.get("batch_stats", {}))),
            replicated(self.mesh))
        if self.param_rules:
            from iif_tpu.parallel.mesh import shard_pytree_by_rules

            state = state.replace(
                params=shard_pytree_by_rules(state.params, self.mesh,
                                             self.param_rules),
                opt_state=shard_pytree_by_rules(state.opt_state, self.mesh,
                                                self.param_rules))
        return state

    def _train_step_impl(self, state: DetTrainState,
                         batch: Dict[str, jnp.ndarray], *,
                         fasa_aug_on: bool = False,
                         use_l1: bool = False
                         ) -> Tuple[DetTrainState, Dict[str, jnp.ndarray]]:
        from iif_tpu.parallel.mesh import spatial_size

        sp_mesh = self.mesh if spatial_size(self.mesh) > 1 else None

        def loss_fn(params, batch_stats, fasa, seesaw_cum, dynamic, mb,
                    key):
            variables = {"params": params, "batch_stats": batch_stats}
            if self.is_seesaw and seesaw_cum is not None:
                import dataclasses as _dc

                loss_cls_obj = _dc.replace(self.loss_cls,
                                           cum_samples=seesaw_cum)
            else:
                loss_cls_obj = self.loss_cls
            if self.is_detr:
                from iif_tpu.detection.detr import detr_loss

                total, losses, aux = detr_loss(
                    self.model, variables, mb, key, self.train_cfg)
            elif self.teacher_model is not None:
                # LD: GFL student distilled from a frozen GFL teacher
                # (kd_one_stage.py; configs/ld)
                from iif_tpu.detection.kd import ld_loss

                total, losses, aux = ld_loss(
                    self.model, variables, self.teacher_model,
                    self.teacher_vars, mb, key, self.train_cfg)
            elif self.is_single_stage:
                from iif_tpu.detection.single_stage import (
                    single_stage_loss_fn,
                )

                ss_kw = {}
                if getattr(self.train_cfg, "loss_kind", "focal") == "ghm":
                    ss_kw["ghm_state"] = dynamic
                if use_l1:
                    # only yolox_loss takes it (the L1-phase hook is a
                    # YOLOX-specific schedule element)
                    ss_kw["use_l1"] = True
                total, losses, aux = single_stage_loss_fn(self.model)(
                    self.model, variables, mb, key, self.train_cfg,
                    **ss_kw)
            elif self.is_cascade_rpn:
                from iif_tpu.detection.cascade_rpn import cascade_rpn_loss

                total, losses, aux = cascade_rpn_loss(
                    self.model, variables, mb, key, self.train_cfg)
            elif self.is_rpn_only:
                from iif_tpu.detection.rpn_detector import rpn_only_loss

                total, losses, aux = rpn_only_loss(
                    self.model, variables, mb, key, self.train_cfg)
            elif self.is_c4:
                from iif_tpu.detection.c4 import c4_loss

                total, losses, aux = c4_loss(
                    self.model, variables, mb, key, loss_cls_obj,
                    self.train_cfg)
            elif self.is_trident:
                from iif_tpu.detection.trident import trident_loss

                total, losses, aux = trident_loss(
                    self.model, variables, mb, key, loss_cls_obj,
                    self.train_cfg)
            elif self.is_htc:
                from iif_tpu.detection.htc import htc_loss

                total, losses, aux = htc_loss(
                    self.model, variables, mb, key, self.stage_losses,
                    self.train_cfg)
            elif self.is_scnet:
                from iif_tpu.detection.scnet import scnet_loss

                total, losses, aux = scnet_loss(
                    self.model, variables, mb, key, self.stage_losses,
                    self.train_cfg)
            elif self.is_cascade:
                total, losses, aux = cascade_loss(
                    self.model, variables, mb, key, self.stage_losses,
                    self.train_cfg, fasa_states=fasa,
                    fasa_cfg=self.fasa_cfg,
                    epoch=1 if fasa_aug_on else 0, mesh=sp_mesh)
            else:
                total, losses, aux = maskrcnn_loss(
                    self.model, variables, mb, key, loss_cls_obj,
                    self.train_cfg, fasa_state=fasa,
                    fasa_cfg=self.fasa_cfg, dynamic_state=dynamic,
                    epoch=1 if fasa_aug_on else 0, mesh=sp_mesh)
            return total, (losses, aux)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        n = self.grad_accum
        if n <= 1:
            key = jax.random.fold_in(self.base_rng, state.step)
            (total, (losses, aux)), grads = grad_fn(
                state.params, state.batch_stats, state.fasa,
                state.seesaw_cum, state.dynamic, batch, key)
            new_stats = aux["batch_stats"]
            new_fasa = aux.get("fasa_state", state.fasa)
            new_cum = aux.get("seesaw_cum", state.seesaw_cum)
            new_dyn = aux.get("dynamic_state", state.dynamic)
        else:
            micro = jax.tree_util.tree_map(
                lambda x: x.reshape((n, x.shape[0] // n) + x.shape[1:]),
                batch)

            def body(carry, xs):
                acc, bstats, fasa, cum, dyn = carry
                i, mb = xs
                key = jax.random.fold_in(self.base_rng,
                                         state.step * n + i)
                (t, (ls, aux)), g = grad_fn(state.params, bstats, fasa,
                                            cum, dyn, mb, key)
                acc = jax.tree_util.tree_map(jnp.add, acc, g)
                return (acc, aux["batch_stats"],
                        aux.get("fasa_state", fasa),
                        aux.get("seesaw_cum", cum),
                        aux.get("dynamic_state", dyn)), (t, ls)

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (acc, new_stats, new_fasa, new_cum, new_dyn), \
                (totals, losses_seq) = \
                jax.lax.scan(body,
                             (zeros, state.batch_stats, state.fasa,
                              state.seesaw_cum, state.dynamic),
                             (jnp.arange(n), micro))
            grads = jax.tree_util.tree_map(lambda g: g / n, acc)
            total = totals.mean()
            losses = jax.tree_util.tree_map(lambda x: x.mean(),
                                            losses_seq)

        updates, new_opt = self.tx.update(grads, state.opt_state,
                                          state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema
        if state.ema is not None and self.ema_cfg is not None:
            # after_train_iter (ema.py:72-83): ema += m * (cur - ema),
            # every ``interval`` iters (m gated to 0 off-interval)
            m = ema_momentum(self.ema_cfg, state.step)
            interval = int(self.ema_cfg.get("interval", 1))
            if interval > 1:
                # mmcv's plain EMAHook (const mode) gates on
                # ``runner.iter % interval``; the mmdet momentum hooks
                # (exp/linear, ema.py:72-83) fire on the (iter+1)-phase.
                phase = (state.step
                         if self.ema_cfg.get("mode", "const") == "const"
                         else state.step + 1)
                m = jnp.where(phase % interval == 0, m, 0.0)
            tgt = {"params": new_params}
            if "batch_stats" in state.ema:
                tgt["batch_stats"] = new_stats
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e + m * (p.astype(e.dtype) - e),
                state.ema, tgt)
        new_state = DetTrainState(
            step=state.step + 1, params=new_params,
            batch_stats=new_stats, opt_state=new_opt, fasa=new_fasa,
            seesaw_cum=new_cum, dynamic=new_dyn, ema=new_ema)
        metrics = dict(losses)
        metrics["loss"] = total
        return new_state, metrics

    def train_one_epoch(self, state: DetTrainState, loader, epoch: int,
                        print_freq: int = 50, print_fn=print,
                        log_writer=None, lr_fn=None, sync_window: int = 4,
                        use_l1: bool = False
                        ) -> Tuple[DetTrainState, MetricLogger]:
        """Epoch loop with ASYNC metric readback: per-step device metrics
        are buffered and read back only when the sliding window fills (one
        oldest-step readback — keeps the device pipelined while bounding
        in-flight batch buffers to ~``sync_window``) or at a print point
        (full drain so meters are current). The per-step ``float()`` sync
        of round 2 serialized dispatch with the ~30 ms tunnel RTT.

        CheckInvalidLossHook fires at readback granularity, matching the
        reference hook's ``interval`` semantics (mmdet checkloss_hook.py —
        it too runs every ``interval`` iters, not every iter)."""
        logger = MetricLogger(print_fn=print_fn)
        loader.set_epoch(epoch)
        header = f"Epoch: [{epoch}]"
        steps_per_epoch = len(loader)
        total = len(loader)

        def _sink(rec):
            if log_writer is None:
                return
            step = epoch * steps_per_epoch + rec["iter"]
            rec = {"mode": "train", "epoch": epoch + 1, **rec}
            if lr_fn is not None:
                rec["lr"] = float(lr_fn(step))
            log_writer.write(rec, step=step)

        pending: list = []   # FIFO of un-read device metric dicts

        def _absorb(device_metrics):
            host = {k: float(v) for k, v in
                    jax.device_get(device_metrics).items()}
            # CheckInvalidLossHook equivalent (mmdet checkloss_hook.py)
            if not np.isfinite(host.get("loss", 0.0)):
                raise FloatingPointError(
                    f"loss became non-finite at epoch {epoch} "
                    f"(metrics: {host})")
            logger.update(**host)

        i = 0
        for batch in logger.log_every(iter(loader), print_freq, header,
                                      total=total, sink=_sink):
            feed = {k: v for k, v in batch.items()
                    if k in ("image", "gt_boxes", "gt_labels", "gt_valid",
                             "gt_masks", "gt_masks_packed",
                             "gt_semantic_seg",
                             "proposals", "proposals_valid")}
            gbatch = shard_batch(feed, self.mesh)
            state, metrics = self._train_step(
                state, gbatch, fasa_aug_on=(state.fasa is not None
                                            and epoch >= 1),
                use_l1=use_l1)
            pending.append(metrics)
            at_print = print_freq and (i % print_freq == 0 or i == total - 1)
            if at_print:
                while pending:
                    _absorb(pending.pop(0))
            elif len(pending) >= max(sync_window, 1):
                _absorb(pending.pop(0))
            i += 1
        while pending:
            _absorb(pending.pop(0))
        return state, logger

    # ------------------------------------------------- FASA dynamic runner
    def fasa_val_epoch(self, state: DetTrainState, loader,
                       print_fn=print) -> DetTrainState:
        """The DynamicRunner val pass: accumulate per-class cum losses on
        the VAL split (the caller passes a val-dataset loader, matching
        ``epoch_based_dynamic_runner.py:48-86`` where workflow
        [('train',1),('val',1)] wraps the val dataloader), then host-side
        dynamic_sampling — per stage for cascade models."""
        assert state.fasa is not None
        fasa = state.fasa
        for batch in loader:
            # masks are not consumed by the FASA val forward — skip the
            # (large) host->device mask transfer entirely
            feed = {k: v for k, v in batch.items()
                    if k in ("image", "gt_boxes", "gt_labels", "gt_valid")}
            gbatch = shard_batch(feed, self.mesh)
            fasa = self._fasa_accumulate_batch(state, gbatch, fasa)
        up = (self.fasa_cfg or {}).get("dynamic_up", 1.1)
        down = (self.fasa_cfg or {}).get("dynamic_down", 0.9)
        if self.is_cascade:
            fasa = tuple(fasa_dynamic_sampling(f, up, down) for f in fasa)
        else:
            fasa = fasa_dynamic_sampling(fasa, up, down)
        print_fn("FASA dynamic sampling: probs updated")
        return state.replace(fasa=fasa)

    @partial(jax.jit, static_argnums=(0,))
    def _fasa_accumulate_batch(self, state: DetTrainState, batch, fasa):
        """One val batch: forward to the bbox-head cls scores (every stage
        for cascade, mirroring the reference where each stage's loss_cls
        accumulates during the val forward), fold per-class losses into
        the FASA counters."""
        from iif_tpu.detection.bbox_head import bbox_targets
        from iif_tpu.detection.cascade import _refine, _select_pred
        from iif_tpu.detection.detector import fpn_shapes, make_anchor_generator
        from iif_tpu.detection.roi_extractor import SingleRoIExtractor
        from iif_tpu.detection.rpn import rpn_proposals

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        images = batch["image"]
        b, img_h, img_w, _ = images.shape
        extract = (CascadeMaskRCNN.extract_feat if self.is_cascade
                   else MaskRCNN.extract_feat)
        fwd_rpn = (CascadeMaskRCNN.forward_rpn if self.is_cascade
                   else MaskRCNN.forward_rpn)
        feats = self.model.apply(variables, images, False, method=extract)
        cls_scores, bbox_preds = self.model.apply(
            variables, feats, method=fwd_rpn)
        gen = make_anchor_generator()
        anchors_np = gen.grid_anchors(fpn_shapes((img_h, img_w)))
        proposals, _, prop_valid = rpn_proposals(
            cls_scores, bbox_preds, [jnp.asarray(a) for a in anchors_np],
            (img_h, img_w), nms_pre=self.train_cfg.rpn_nms_pre,
            max_per_img=self.train_cfg.rpn_max_per_img,
            nms_iou=self.train_cfg.rpn_nms_iou)
        key = jax.random.fold_in(self.base_rng, state.step + 999_983)
        r = self.train_cfg.rcnn_num_samples
        extractor = SingleRoIExtractor((7, 7))
        bidx = jnp.repeat(jnp.arange(b, dtype=jnp.float32), r)

        if not self.is_cascade:
            tgts = bbox_targets(
                key, proposals, prop_valid, batch["gt_boxes"],
                batch["gt_labels"], batch["gt_valid"],
                self.model.num_classes, num_samples=r,
                pos_fraction=self.train_cfg.rcnn_pos_fraction)
            rois5 = jnp.concatenate(
                [bidx[:, None], tgts.rois.reshape(-1, 4)], axis=1)
            roi_feats = extractor(feats[:4], rois5)
            cls_score, _, _ = self.model.apply(
                variables, roi_feats, method=MaskRCNN.forward_bbox)
            return fasa_accumulate_val(
                fasa, self.loss_cls, cls_score, tgts.labels.reshape(-1),
                tgts.label_weights.reshape(-1))

        new_fasa = []
        keys = jax.random.split(key, self.model.num_stages)
        for stage in range(self.model.num_stages):
            iou = self.model.stage_ious[stage]
            tgts = bbox_targets(
                keys[stage], proposals, prop_valid, batch["gt_boxes"],
                batch["gt_labels"], batch["gt_valid"],
                self.model.num_classes, num_samples=r,
                pos_fraction=self.train_cfg.rcnn_pos_fraction,
                pos_iou_thr=iou, neg_iou_thr=iou, min_pos_iou=iou,
                add_gt_as_proposals=stage == 0)
            rois5 = jnp.concatenate(
                [bidx[:, None], tgts.rois.reshape(-1, 4)], axis=1)
            roi_feats = extractor(feats[:4], rois5)
            cls_score, bbox_pred, _ = self.model.apply(
                variables, roi_feats, stage,
                method=CascadeMaskRCNN.forward_bbox_stage)
            labels = tgts.labels.reshape(-1)
            new_fasa.append(fasa_accumulate_val(
                fasa[stage], self.stage_losses[stage], cls_score, labels,
                tgts.label_weights.reshape(-1)))
            if stage < self.model.num_stages - 1:
                pred4 = _select_pred(bbox_pred, labels,
                                     self.model.num_classes,
                                     self.model.reg_class_agnostic)
                proposals = _refine(
                    tgts.rois.reshape(-1, 4), pred4, (img_h, img_w),
                    self.model.stage_stds[stage]).reshape(b, r, 4)
                prop_valid = tgts.label_weights > 0
        return tuple(new_fasa)


def frozen_backbone_mask(params: Any, frozen_stages: int) -> Any:
    """Boolean pytree, True = trainable: the stem and stages <=
    ``frozen_stages`` are frozen (reference mmdet ResNet._freeze_stages
    sets requires_grad=False — no gradient, no weight decay)."""
    frozen_prefixes = []
    if frozen_stages >= 0:
        frozen_prefixes = ["conv1", "bn1"] + [
            f"layer{s}_" for s in range(1, frozen_stages + 1)]

    def _trainable(path) -> bool:
        keys = [str(getattr(k, "key", "")) for k in path]
        if len(keys) < 2 or keys[0] != "backbone":
            return True
        return not any(keys[1].startswith(p) for p in frozen_prefixes)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [_trainable(p) for p, _ in flat])


def combine_masks(*masks) -> Any:
    """AND several trainable-param masks (e.g. frozen backbone + selectp)."""
    out = masks[0]
    for m in masks[1:]:
        out = jax.tree_util.tree_map(lambda a, b: a and b, out, m)
    return out


# ---------------------------------------------------- selectp param freezing
def selectp_mask(params: Any, selectp: int) -> Any:
    """Trainable-param masks for decoupled detector finetuning
    (``tools/train.py:87-128``): 1 = fc_cls only; 2 = whole bbox head;
    3 = cascade fc_cls stages; 4 = bbox + mask heads."""
    def _trainable(path) -> bool:
        keys = [getattr(k, "key", "") for k in path]
        in_bbox = any(str(k).startswith("bbox_head") for k in keys)
        in_mask = any(str(k).startswith("mask_head") for k in keys)
        has_cls = any(str(k) == "fc_cls" for k in keys)
        if selectp == 1:
            return in_bbox and has_cls
        if selectp == 2:
            return in_bbox
        if selectp == 3:
            return in_bbox and has_cls  # cascade heads share the prefix
        if selectp == 4:
            return in_bbox or in_mask
        return True

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [_trainable(p) for p, _ in flat])
