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

from typing import Any, Callable, NamedTuple

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


class FusedSGDState(NamedTuple):
    """Flat-buffer SGD state: ONE momentum vector over every trainable
    element (plus the injected-lr dict, mirroring inject_hyperparams)."""
    momentum: Any
    hyperparams: dict


class FusedSGD:
    """SGD(momentum, decoupled wd, optional clip) over ONE flattened
    parameter buffer instead of optax's per-parameter chain.

    Round-4 trace: the per-parameter optimizer/grad fusions cost
    10.2 ms/step across 86 instances (~0.12 ms of fixed per-fusion
    overhead each) on the flagship train step.  Element-wise update math
    is order-independent, so running it over one [41M] vector replaces 86
    small fused loops with one long one.  Math is IDENTICAL to the optax
    chain (clip -> g+wd*p -> momentum trace -> -lr scale), in f32, in the
    same order; only the reduction order inside the global grad-norm and
    the memory layout differ.

    Frozen backbone stages are excluded from the flat buffer (leaves
    swap to 0-size vectors before ravelling), exactly like the
    ``optax.masked`` wrapper they replace.
    """

    def __init__(self, train_cfg: TrainConfig, model_cfg: ModelConfig):
        self.lr0 = train_cfg.lr
        self.momentum = train_cfg.momentum
        self.weight_decay = train_cfg.weight_decay
        self.clip = train_cfg.clip_grad_norm
        self.acc_bf16 = train_cfg.momentum_dtype == "bfloat16"
        self._mask_fn = trainable_mask_fn(model_cfg)

    def _subset(self, tree, mask):
        import jax
        import jax.numpy as jnp

        return jax.tree.map(
            lambda x, m: x if m else jnp.zeros((0,), x.dtype), tree, mask)

    def init(self, params) -> FusedSGDState:
        import jax.numpy as jnp
        from jax.flatten_util import ravel_pytree

        flat, _ = ravel_pytree(self._subset(params, self._mask_fn(params)))
        mom = jnp.zeros_like(
            flat, dtype=jnp.bfloat16 if self.acc_bf16 else jnp.float32)
        return FusedSGDState(
            momentum=mom,
            hyperparams={"learning_rate": jnp.asarray(self.lr0,
                                                      jnp.float32)})

    def fused_update_params(self, grads, opt_state: FusedSGDState, params):
        """(grads, state, params) -> (new_params, new_state): the update
        AND the parameter add happen on the flat buffer (no per-parameter
        apply_updates pass)."""
        import jax
        import jax.numpy as jnp
        from jax.flatten_util import ravel_pytree

        mask = self._mask_fn(params)
        lr = opt_state.hyperparams["learning_rate"]
        g, _ = ravel_pytree(self._subset(grads, mask))
        p, unravel = ravel_pytree(self._subset(params, mask))
        g = g.astype(jnp.float32)
        if self.clip:
            # optax.clip_by_global_norm semantics (scale only when the
            # norm exceeds the cap).
            norm = jnp.sqrt(jnp.sum(g * g))
            g = g * jnp.where(norm > self.clip, self.clip / norm, 1.0)
        u = g + self.weight_decay * p
        m = self.momentum * opt_state.momentum.astype(jnp.float32) + u
        new_p = unravel(p - lr * m)
        new_state = FusedSGDState(
            momentum=m.astype(opt_state.momentum.dtype),
            hyperparams={"learning_rate": lr})
        params = jax.tree.map(
            lambda new, old, keep: new if keep else old,
            new_p, params, mask)
        return params, new_state


def apply_optimizer(tx, grads, opt_state, params, lr):
    """Shared step-side optimizer application: injects ``lr`` and runs
    either the fused flat-buffer path (FusedSGD) or the standard optax
    update+apply — the single place the two interfaces meet."""
    opt_state.hyperparams["learning_rate"] = lr
    if hasattr(tx, "fused_update_params"):
        return tx.fused_update_params(grads, opt_state, params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state


def make_optimizer(train_cfg: TrainConfig, model_cfg: ModelConfig):
    """Returns an ``optax.GradientTransformation`` whose learning rate lives
    in ``opt_state.hyperparams['learning_rate']`` (inject_hyperparams) —
    or, with ``TrainConfig.fused_sgd``, the flat-buffer :class:`FusedSGD`
    (same injected-lr surface, fused update+apply)."""
    if train_cfg.optimiser == "sgd" and train_cfg.fused_sgd:
        if train_cfg.norm_weight_decay is not None:
            raise ValueError(
                "fused_sgd supports a single weight-decay rate; unset "
                "norm_weight_decay (or fused_sgd) for the split chain")
        return FusedSGD(train_cfg, model_cfg)
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
