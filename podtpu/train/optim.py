"""Optimizer construction with frozen-parameter masking.

The reference builds torch SGD(lr=0.005, momentum=0.9, wd=5e-4) or
Adam(lr=0.001) over ``requires_grad`` parameters only
(`miso/object_detection/training.py:96-106`).  Here the equivalent: an optax
chain with the learning rate injected per step (so the host-side ALRS/warmup
schedule can steer it without recompiling), masked so frozen backbone stages
receive no updates (matching ``requires_grad=False`` — in particular no
weight decay creep on frozen params).
"""
from __future__ import annotations

from typing import Callable

import optax

from podtpu.core.config import ModelConfig, TrainConfig


def trainable_mask_fn(model_cfg: ModelConfig) -> Callable:
    """Pytree-of-bools mask: False for parameters of frozen backbone stages."""
    frozen_stages = 5 - model_cfg.trainable_backbone_stages
    frozen_prefixes = []
    if frozen_stages >= 1:
        frozen_prefixes += ["conv1", "bn1"]
    for s in range(1, frozen_stages):
        frozen_prefixes.append(f"layer{s}_")

    def mask(params):
        import jax

        def is_trainable(path):
            keys = [getattr(p, "key", str(p)) for p in path]
            if keys and keys[0] == "backbone" and len(keys) > 1:
                return not any(str(keys[1]).startswith(p)
                               for p in frozen_prefixes)
            return True

        return jax.tree_util.tree_map_with_path(
            lambda path, _: is_trainable(path), params)

    return mask


def norm_param_mask(params, invert: bool = False):
    """Pytree-of-bools: True for trainable normalisation parameters —
    GroupNorm scale/bias (module names ``gn*`` / ``*_gn*``) and SSD's
    ``l2norm_scale``.  FrozenBatchNorm lives in the ``frozen`` collection,
    so it never reaches the optimizer.  Used by the vendored trainer's
    ``--norm-weight-decay`` split (`engine/train.py:231-236`)."""
    import jax

    def is_norm(path):
        keys = [str(getattr(p, "key", p)) for p in path]
        return any(k.startswith("gn") or "_gn" in k or k == "l2norm_scale"
                   for k in keys)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: is_norm(path) ^ invert, params)


def _weight_decay(train_cfg: TrainConfig):
    """The decoupled weight-decay component: one rate for everything, or
    the vendored trainer's norm/non-norm split when ``norm_weight_decay``
    is set."""
    if train_cfg.norm_weight_decay is None:
        return optax.add_decayed_weights(train_cfg.weight_decay)
    return optax.chain(
        optax.masked(optax.add_decayed_weights(train_cfg.weight_decay),
                     lambda p: norm_param_mask(p, invert=True)),
        optax.masked(
            optax.add_decayed_weights(float(train_cfg.norm_weight_decay)),
            norm_param_mask),
    )


def make_optimizer(train_cfg: TrainConfig, model_cfg: ModelConfig):
    """Returns an ``optax.GradientTransformation`` whose learning rate lives
    in ``opt_state.hyperparams['learning_rate']`` (inject_hyperparams)."""
    mask = trainable_mask_fn(model_cfg)

    # Optional global-norm gradient clipping (stabilises loss spikes that
    # NaN the run — e.g. FCOS's focal+GIoU recipe from scratch at the
    # reference's SGD lr; identity when disabled).
    clip = (optax.clip_by_global_norm(train_cfg.clip_grad_norm)
            if train_cfg.clip_grad_norm else optax.identity())

    if train_cfg.optimiser == "sgd":
        import jax.numpy as jnp
        acc_dtype = (jnp.bfloat16
                     if train_cfg.momentum_dtype == "bfloat16" else None)

        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.masked(
                optax.chain(
                    clip,
                    _weight_decay(train_cfg),
                    optax.trace(decay=train_cfg.momentum,
                                accumulator_dtype=acc_dtype),
                    optax.scale_by_learning_rate(learning_rate),  # -lr
                ), mask)
        return make(learning_rate=train_cfg.lr)
    if train_cfg.optimiser == "adam":
        if train_cfg.norm_weight_decay is not None:
            raise ValueError(
                "--norm-weight-decay has no effect with --optimiser adam: "
                "the plain-Adam chain applies no weight decay (reference "
                "training.py:103-106); use sgd or adamw")
        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.masked(
                optax.chain(
                    clip,
                    optax.scale_by_adam(),
                    optax.scale_by_learning_rate(learning_rate),  # -lr
                ), mask)
        return make(learning_rate=train_cfg.adam_lr)
    if train_cfg.optimiser == "adamw":
        # The vendored trainer's AdamW option (`engine/train.py:238-250`):
        # decoupled weight decay applied AFTER the Adam scaling (torch
        # AdamW semantics), honouring the norm-weight-decay split.
        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.masked(
                optax.chain(
                    clip,
                    optax.scale_by_adam(),
                    _weight_decay(train_cfg),
                    optax.scale_by_learning_rate(learning_rate),  # -lr
                ), mask)
        return make(learning_rate=train_cfg.adam_lr)
    raise ValueError("Optimiser must be one of 'sgd', 'adam' or 'adamw'")
