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
        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.masked(
                optax.chain(
                    clip,
                    optax.add_decayed_weights(train_cfg.weight_decay),
                    optax.trace(decay=train_cfg.momentum),
                    optax.scale_by_learning_rate(learning_rate),  # -lr
                ), mask)
        return make(learning_rate=train_cfg.lr)
    if train_cfg.optimiser == "adam":
        @optax.inject_hyperparams
        def make(learning_rate):
            return optax.masked(
                optax.chain(
                    clip,
                    optax.scale_by_adam(),
                    optax.scale_by_learning_rate(learning_rate),  # -lr
                ), mask)
        return make(learning_rate=train_cfg.adam_lr)
    raise ValueError("Optimiser must be one of 'sgd' or 'adam'")
