"""Classification trainer — TPU-native rebuild of
``classification/train.py`` (epoch loop, warmup, mixup, eval with
inference-time IIF, checkpointing).

Design: one jitted SPMD train step per iteration. The step consumes the raw
uint8 global batch (sharded over the 'data' mesh axis), runs the fused
device-side augmentation, forward, loss, backward and optimizer update in a
single XLA program; gradients all-reduce over ICI automatically because the
batch is sharded and the params are replicated. There is no DDP, no
gradient bucketing, no host sync per step.
"""
from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh

from iif_tpu.losses.mixup import mixup_batch, mixup_criterion
from iif_tpu.parallel.mesh import data_sharding, replicated, shard_batch
from iif_tpu.utils.metrics import MetricLogger, SmoothedValue


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class ClassificationTrainer:
    """Owns the jitted train/eval steps.

    Parameters
    ----------
    model: flax Module with ``__call__(x, train)`` -> logits
    criterion: loss callable (IIFLoss / FocalLoss / CrossEntropyLoss)
    tx: optax GradientTransformation
    mesh: device mesh ('data'[, 'model'])
    train_augment: fn(key, uint8_images) -> float inputs (device-side)
    eval_transform: fn(uint8_images) -> float inputs
    mixup_alpha: enable mixup when not None (reference `--mixup`)
    num_classes: for per-class eval accumulators (shot accuracy)
    compute_dtype: bf16 by default — TPU-native mixed precision replacing
      the reference's apex AMP (`classification/train.py:73-75`); params and
      the loss stay fp32.
    """

    def __init__(
        self,
        model,
        criterion,
        tx: optax.GradientTransformation,
        mesh: Mesh,
        train_augment: Callable,
        eval_transform: Callable,
        num_classes: int,
        mixup_alpha: Optional[float] = None,
        compute_dtype=jnp.bfloat16,
        seed: int = 0,
        qat=None,                      # iif_tpu.quant.QatConfig
    ):
        # thread the compute dtype into the model itself: casting only the
        # input is useless — flax promotes bf16 activations back to f32
        # against the f32 params at the first conv (measured: the bench
        # R50 step ran entirely in f32, 199 ms vs 73 ms for true bf16)
        if (compute_dtype not in (None, jnp.float32)
                and hasattr(model, "dtype") and model.dtype is None):
            model = model.clone(dtype=compute_dtype)
        self.model = model
        self.criterion = criterion
        self.tx = tx
        self.mesh = mesh
        self.train_augment = train_augment
        self.eval_transform = eval_transform
        self.num_classes = num_classes
        self.mixup_alpha = mixup_alpha
        self.compute_dtype = compute_dtype
        self.base_rng = jax.random.PRNGKey(seed)
        self.qat = qat
        self.frozen_scales = None      # set at the observer-freeze epoch

        self._train_step = jax.jit(
            self._train_step_impl, donate_argnums=(0,),
            static_argnames=("quant_on", "freeze_bn"))
        self._eval_step = jax.jit(self._eval_step_impl)

    # ------------------------------------------------------------------ init
    def init_state(self, sample_shape: Tuple[int, ...], seed: int = 0
                   ) -> TrainState:
        rng = jax.random.PRNGKey(seed)
        dummy = jnp.zeros((1,) + tuple(sample_shape), self.compute_dtype)
        variables = jax.jit(
            lambda r, x: self.model.init(r, x, train=False))(rng, dummy)
        params = variables.get("params", {})
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats, opt_state=opt_state)
        return jax.device_put(state, replicated(self.mesh))

    # ------------------------------------------------------------ train step
    def _forward(self, params, batch_stats, x, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            logits, mutated = self.model.apply(
                variables, x, train=True, mutable=["batch_stats"])
            return logits, mutated.get("batch_stats", batch_stats)
        logits = self.model.apply(variables, x, train=False)
        return logits, batch_stats

    def _train_step_impl(self, state: TrainState, batch: Dict[str, jnp.ndarray],
                         frozen_scales=None, *, quant_on: bool = False,
                         freeze_bn: bool = False
                         ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        step_key = jax.random.fold_in(self.base_rng, state.step)
        k_aug, k_mix = jax.random.split(step_key)
        x = self.train_augment(k_aug, batch["image"]).astype(self.compute_dtype)
        y = batch["label"]

        if self.mixup_alpha is not None:
            x, y_a, y_b, lam = mixup_batch(k_mix, x, y, self.mixup_alpha)

        def loss_fn(params):
            fwd_params = params
            if quant_on:
                from iif_tpu.quant import fake_quant_params

                fwd_params = fake_quant_params(
                    params, scales=frozen_scales,
                    per_channel=self.qat.per_channel if self.qat else True)
            logits, new_bs = self._forward(
                fwd_params, state.batch_stats, x, not freeze_bn)
            logits32 = logits.astype(jnp.float32)
            if self.mixup_alpha is not None:
                loss = mixup_criterion(self.criterion, logits32, y_a, y_b, lam)
            else:
                loss = self.criterion(logits32, y)
            return loss, (logits32, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        _, top5 = jax.lax.top_k(logits, 5)
        correct = top5 == y[:, None]
        metrics = {
            "loss": loss,
            "acc1": correct[:, :1].any(1).mean() * 100.0,
            "acc5": correct.any(1).mean() * 100.0,
        }
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, batch: Dict[str, jnp.ndarray]
                        ) -> Dict[str, jnp.ndarray]:
        x = self.eval_transform(batch["image"]).astype(self.compute_dtype)
        y = batch["label"]
        valid = batch["valid"].astype(jnp.float32)
        logits, _ = self._forward(state.params, state.batch_stats, x, False)
        logits = logits.astype(jnp.float32)
        # inference-time IIF (reference train.py:104-105)
        if getattr(self.criterion, "iif", False):
            logits = self.criterion.transform(logits)
        _, top5 = jax.lax.top_k(logits, 5)
        hit = top5 == y[:, None]
        c1 = hit[:, :1].any(1).astype(jnp.float32) * valid
        c5 = hit.any(1).astype(jnp.float32) * valid
        onehot = jax.nn.one_hot(y, self.num_classes, dtype=jnp.float32)
        return {
            "correct1": c1.sum(),
            "correct5": c5.sum(),
            "count": valid.sum(),
            "percls_correct": (onehot * (c1 * valid)[:, None]).sum(0),
            "percls_total": (onehot * valid[:, None]).sum(0),
            "pred": top5[:, 0],
        }

    # ----------------------------------------------------------------- loops
    def train_one_epoch(self, state: TrainState, loader, epoch: int,
                        print_freq: int = 100, print_fn=print,
                        log_writer=None
                        ) -> Tuple[TrainState, MetricLogger]:
        logger = MetricLogger(print_fn=print_fn)
        logger.add_meter("img/s", SmoothedValue(window_size=10, fmt="{value:.1f}"))
        loader.set_epoch(epoch)
        header = f"Epoch: [{epoch}]"
        steps_per_epoch = len(loader)

        def _sink(rec):
            if log_writer is not None:
                step = epoch * steps_per_epoch + rec["iter"]
                log_writer.write({"mode": "train", "epoch": epoch + 1,
                                  **rec}, step=step)

        quant_on = bool(self.qat and self.qat.enabled)
        freeze_bn = bool(self.qat and self.qat.enabled
                         and epoch >= self.qat.freeze_bn_epoch)
        if quant_on and epoch >= self.qat.freeze_observer_epoch \
                and self.frozen_scales is None:
            from iif_tpu.quant import observe_scales

            self.frozen_scales = jax.jit(observe_scales)(state.params)

        # async metric readback: buffer device metrics and read back only
        # when the sliding window fills or at a print point, so step
        # dispatch is not serialized with the per-step host RTT (same
        # pattern as DetectionTrainer.train_one_epoch). img/s is measured
        # per readback group: images absorbed / wall time since the last
        # readback — the honest pipelined throughput.
        pending: list = []   # FIFO of (device_metrics, bsz)
        sync_window = 4
        total = len(loader)
        clock = [None]       # wall time of the last readback

        def _absorb(n: int):
            group = pending[:n]
            del pending[:n]
            imgs = 0
            for device_metrics, bsz in group:
                m = jax.device_get(device_metrics)
                logger.update(loss=m["loss"], acc1=m["acc1"], acc5=m["acc5"])
                imgs += bsz
            now = time.time()
            if clock[0] is not None:
                logger.meters["img/s"].update(
                    imgs / max(now - clock[0], 1e-9))
            clock[0] = now

        i = 0
        for batch in logger.log_every(iter(loader), print_freq, header,
                                      total=total, sink=_sink):
            if clock[0] is None:
                clock[0] = time.time()
            gbatch = shard_batch(
                {"image": batch["image"], "label": batch["label"]}, self.mesh)
            state, metrics = self._train_step(
                state, gbatch, self.frozen_scales, quant_on=quant_on,
                freeze_bn=freeze_bn)
            bsz = batch["image"].shape[0] * max(jax.process_count(), 1)
            pending.append((metrics, bsz))
            at_print = print_freq and (i % print_freq == 0 or i == total - 1)
            if at_print:
                _absorb(len(pending))
            elif len(pending) >= sync_window:
                _absorb(1)
            i += 1
        if pending:
            _absorb(len(pending))
        return state, logger

    def evaluate_quantized(self, state: TrainState, batches, print_fn=print
                           ) -> Dict[str, Any]:
        """Eval the converted-int8 model (reference evaluates both the QAT
        model and an int8 CPU copy each epoch,
        ``train_quantization.py:129-139``). fake-quant == int8-dequant
        numerics, so this is the converted model's accuracy."""
        from iif_tpu.quant import fake_quant_params

        qparams = jax.jit(fake_quant_params)(state.params) \
            if self.frozen_scales is None else jax.jit(
                lambda p: fake_quant_params(p, self.frozen_scales)
            )(state.params)
        return self.evaluate(state.replace(params=qparams), batches,
                             print_fn=print_fn)

    def evaluate(self, state: TrainState, batches, print_fn=print
                 ) -> Dict[str, Any]:
        tot = {"correct1": 0.0, "correct5": 0.0, "count": 0.0}
        percls_c = np.zeros(self.num_classes)
        percls_t = np.zeros(self.num_classes)
        preds, labels = [], []
        for batch in batches:
            gbatch = shard_batch(batch, self.mesh)
            out = jax.device_get(self._eval_step(state, gbatch))
            for k in tot:
                tot[k] += float(out[k])
            percls_c += out["percls_correct"]
            percls_t += out["percls_total"]
            m = np.asarray(batch["valid"], dtype=bool)
            preds.append(np.asarray(out["pred"])[:len(m)][m])
            labels.append(np.asarray(batch["label"])[m])
        acc1 = 100.0 * tot["correct1"] / max(tot["count"], 1)
        acc5 = 100.0 * tot["correct5"] / max(tot["count"], 1)
        print_fn(f" * Acc@1 {acc1:.3f} Acc@5 {acc5:.3f}")
        return {
            "acc1": acc1,
            "acc5": acc5,
            "count": tot["count"],
            "percls_correct": percls_c,
            "percls_total": percls_t,
            "preds": np.concatenate(preds) if preds else np.empty(0, np.int64),
            "labels": np.concatenate(labels) if labels else np.empty(0, np.int64),
        }
