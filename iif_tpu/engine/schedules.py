"""LR schedules + optimizer builders matching the reference trainer.

Schedule semantics (reference ``classification/train.py:51-56,223-228,261``
and ``utils.py:182-189``):
- epoch-0 linear warmup from ``lr/1000`` over ``min(1000, steps_per_epoch-1)``
  iterations;
- then either MultiStepLR (gamma at epoch milestones, stepped per epoch) or
  CosineAnnealingLR over ``epochs`` (eta_min=0), both expressed here as pure
  functions of the global step so the whole schedule jits.

Optimizers (``train.py:196-210``): sgd / nesterov / rmsprop, with torch
coupled weight decay (wd added to the gradient before the momentum buffer).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np
import optax


def build_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    milestones: Sequence[int] = (),
    lr_gamma: float = 0.1,
    cosine: bool = False,
    warmup: bool = True,
    warmup_factor: float = 1.0 / 1000,
    warmup_iters: Optional[int] = None,
) -> optax.Schedule:
    """``warmup_iters=None`` keeps the classification-trainer default
    (min(1000, steps-1)); detection configs pass the reference's explicit
    ``lr_config.warmup_iters`` (500 for every LVIS recipe)."""
    milestones = np.asarray(sorted(milestones), dtype=np.int32)
    if not warmup:
        warmup_iters = 0
    elif warmup_iters is None:
        warmup_iters = min(1000, max(steps_per_epoch - 1, 1))

    def schedule(step):
        step = jnp.asarray(step)
        epoch = step // steps_per_epoch
        if cosine:
            # torch CosineAnnealingLR stepped per epoch, eta_min=0
            factor = 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))
        else:
            n_decays = jnp.sum(epoch >= jnp.asarray(milestones)[None].reshape(-1)) \
                if len(milestones) else 0
            factor = lr_gamma ** n_decays
        if warmup_iters > 0:
            alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
            wfac = warmup_factor * (1 - alpha) + alpha
            factor = jnp.where(step < warmup_iters, factor * wfac, factor)
        return base_lr * factor

    return schedule


def build_yolox_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    epochs: int,
    num_last_epochs: int = 15,
    warmup_epochs: int = 5,
    warmup_ratio: float = 1.0,
    min_lr_ratio: float = 0.05,
) -> optax.Schedule:
    """The YOLOX LR policy (reference yolox_lrupdater_hook.py:28-67):

    - quadratic "exp" warmup ``k = warmup_ratio * ((i+1)/warmup_iters)^2``
      over ``warmup_epochs`` (the config's ``warmup_by_epoch=True,
      warmup_iters=5``),
    - cosine anneal from ``base_lr`` to ``base_lr * min_lr_ratio`` with
      progress ``(i+1 - warmup_iters) / (max_iters - warmup_iters -
      last_iters)`` (mmcv ``annealing_cos``),
    - a FIXED target LR for the final ``num_last_epochs`` (the no-aug /
      L1 phase the YOLOXModeSwitchHook opens).
    """
    warmup_iters = warmup_epochs * steps_per_epoch
    max_iters = epochs * steps_per_epoch
    last_iters = num_last_epochs * steps_per_epoch
    target_lr = base_lr * min_lr_ratio
    denom = max(max_iters - warmup_iters - last_iters, 1)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        progress = step + 1.0       # the hook evaluates at iter+1
        frac = (progress - warmup_iters) / denom
        cos = target_lr + 0.5 * (base_lr - target_lr) * (
            1.0 + jnp.cos(jnp.pi * frac))
        out = jnp.where(progress >= max_iters - last_iters, target_lr, cos)
        # warmup scales BASE_LR: get_warmup_lr passes self.base_lr into
        # _get_warmup_lr (yolox_lrupdater_hook.py:36-42 — the local param
        # is only *named* regular_lr), so warmup_lr = base_lr * k
        warm = base_lr * warmup_ratio * (progress / max(warmup_iters, 1)) ** 2
        return jnp.where(step < warmup_iters, warm, out)

    return schedule


def build_optimizer(
    opt_name: str,
    lr_schedule: optax.Schedule,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    trainable_mask=None,
    grad_clip: Optional[float] = None,
    decay_mask=None,
) -> optax.GradientTransformation:
    """torch-style coupled weight decay + SGD momentum (buf = m*buf + g;
    update = -lr*buf == torch SGD dampening=0). ``grad_clip`` = global-norm
    clipping (the reference's mmcv ``optimizer_config.grad_clip``, used by
    the LVIS/FASA configs with max_norm=35)."""
    opt_name = opt_name.lower()
    chain = []
    if trainable_mask is not None:
        # frozen params (decoup / frozen_stages): torch requires_grad=False
        # semantics — neither gradients NOR weight decay touch them. Zero
        # incoming grads here (so clipping sees only trainable grads, like
        # torch clip-then-step) and zero the final update again after wd.
        chain.append(optax.masked(optax.set_to_zero(),
                                  lambda p: _invert_mask(trainable_mask, p)))
    if grad_clip:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay and opt_name != "adamw":
        chain.append(optax.add_decayed_weights(weight_decay,
                                               mask=decay_mask))
    if trainable_mask is not None and weight_decay:
        chain.append(optax.masked(optax.set_to_zero(),
                                  lambda p: _invert_mask(trainable_mask, p)))
    if opt_name == "adamw":
        # reference rsb recipe: AdamW lr 2e-4 wd 0.05, paramwise
        # norm_decay_mult=0 (fasa_iof_..._1x_rsb.py) — decoupled wd applied
        # inside the lr scaling, norm params excluded via decay_mask
        chain += [optax.scale_by_adam()]
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay,
                                                   mask=decay_mask))
            if trainable_mask is not None:
                # re-zero frozen params: the decoupled decay above runs
                # after the earlier set_to_zero, so without this frozen
                # leaves would still drift under adamw+freeze
                chain.append(optax.masked(
                    optax.set_to_zero(),
                    lambda p: _invert_mask(trainable_mask, p)))
        chain.append(optax.scale_by_learning_rate(lr_schedule))
    elif opt_name == "sgd":
        chain += [optax.trace(decay=momentum),
                  optax.scale_by_learning_rate(lr_schedule)]
    elif opt_name == "nesterov":
        chain += [optax.trace(decay=momentum, nesterov=True),
                  optax.scale_by_learning_rate(lr_schedule)]
    elif opt_name == "rmsprop":
        # reference: RMSprop(momentum, eps=0.0316, alpha=0.9)
        chain += [optax.scale_by_rms(decay=0.9, eps=0.0316),
                  optax.trace(decay=momentum),
                  optax.scale_by_learning_rate(lr_schedule)]
    else:
        raise ValueError(
            f"Invalid optimizer {opt_name}. Only SGD and RMSprop are supported.")
    return optax.chain(*chain)


def _invert_mask(mask_tree, params):
    import jax

    return jax.tree_util.tree_map(lambda m: not m, mask_tree)


def norm_decay_mask(params):
    """Decay mask excluding normalization params (True = decay): flax BN
    leaves are ``scale`` plus the ``bias`` that lives next to a ``scale``
    sibling. This is the reference rsb recipe's paramwise
    ``norm_decay_mult=0.`` (fasa_iof_base10_..._1x_rsb.py)."""
    import jax

    def _walk(node):
        if not isinstance(node, dict):
            return True
        is_norm = "scale" in node and isinstance(
            node.get("scale"), (jax.Array,)) or (
            "scale" in node and not isinstance(node["scale"], dict))
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = _walk(v)
            else:
                out[k] = not (k == "scale" or (k == "bias" and is_norm))
        return out

    return _walk(jax.tree_util.tree_map(lambda x: x, params))


HEAD_NAMES = ("linear", "Dense_0", "NormedLinear_0", "CosNormClassifier_0")


def classifier_mask(params, head_names=HEAD_NAMES):
    """Boolean pytree: True for classifier-head params (trainable under
    `--decoup`, reference ``train.py:123-145``)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def _is_head(path):
        return any(getattr(k, "key", None) in head_names for k in path)

    treedef = jax.tree_util.tree_structure(params)
    mask_flat = [_is_head(path) for path, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def places_finetune_mask(params, head_names=HEAD_NAMES):
    """Places-LT finetune (reference ``train.py:148-165`` finetune_places):
    trainable = classifier head + the LAST block of stage 4."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # find the highest block index in layer4
    last_idx = -1
    for path, _ in flat:
        k = str(getattr(path[0], "key", ""))
        if k.startswith("layer4_"):
            last_idx = max(last_idx, int(k.split("_")[1]))
    last_name = f"layer4_{last_idx}"

    def _trainable(path):
        keys = [str(getattr(k, "key", "")) for k in path]
        return any(k in head_names for k in keys) or last_name in keys

    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(
        treedef, [_trainable(p) for p, _ in flat])


def reinit_classifier_head(params, seed: int = 0, head_names=HEAD_NAMES):
    """Re-initialize the classifier head for decoupled retraining
    (reference ``train.py:123-145``: xavier-uniform weight, bias 0.01)."""
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    flat = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    new_flat = {}
    for path, leaf in flat.items():
        in_head = any(getattr(k, "key", None) in head_names for k in path)
        name = getattr(path[-1], "key", "")
        if in_head and name in ("kernel", "weight") and leaf.ndim >= 2:
            key, sub = jax.random.split(key)
            new_flat[path] = jax.nn.initializers.xavier_uniform()(
                sub, leaf.shape, leaf.dtype)
        elif in_head and name == "bias":
            new_flat[path] = jnp.full_like(leaf, 0.01)
        else:
            new_flat[path] = leaf
    treedef = jax.tree_util.tree_structure(params)
    leaves = [new_flat[p] for p, _ in
              jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves)
