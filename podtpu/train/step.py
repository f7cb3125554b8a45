"""Jitted train / eval steps.

Counterpart of the reference's epoch engine
(`miso/object_detection/engine/engine.py:12-117`): forward, summed loss dict,
backward, optimizer step, LR warmup on epoch 0 — but as ONE XLA program per
step: device-side augmentation -> model forward -> loss -> grad -> update,
with the learning rate injected as a scalar input (warmup + ALRS run on
host).  The NaN hard-exit (engine.py:42-45) is enforced host-side whenever
metrics are fetched.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from podtpu.core.config import Config
from podtpu.models.detector import FasterRCNN


def images_to_float(images: jnp.ndarray) -> jnp.ndarray:
    """uint8 canvases -> [0,1] float on device (loaders ship uint8: 4x
    less host->device transfer); float inputs pass through unchanged.

    The model's ``_features`` applies the same guard, so eval paths may
    feed uint8 directly; train steps still call this explicitly because
    the photometric augmentation needs [0,1] floats BEFORE the model."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def split_eval_output(out):
    """``(Detections, masks | None, keypoints | None)`` from an eval-step
    result.

    Mask models return ``(Detections, masks [B, D, M, M])``; keypoint
    models ``(Detections, KeypointOutput([B, D, K, 3]))``; box models the
    ``Detections`` NamedTuple alone.  The single probe every consumer
    (evaluate / infer / tiled / server) goes through, so a change to the
    eval-step return shape has exactly one place to update.  The keypoint
    extra is a typed NamedTuple (preserved through jit pytrees), so no
    shape sniffing is needed."""
    from podtpu.models.roi_heads import KeypointOutput

    if hasattr(out, "boxes"):
        return out, None, None
    det, extra = out
    if isinstance(extra, KeypointOutput):
        return det, None, extra.keypoints
    return det, extra, None


class TrainState(NamedTuple):
    params: Any
    frozen: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    return TrainState(
        params=params,
        # Backbones without FrozenBatchNorm (SSD's VGG16) init no 'frozen'
        # collection; an empty dict applies cleanly.
        frozen=variables.get("frozen", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model: FasterRCNN, tx, cfg: Config):
    """Build the jitted train step: (state, batch, rng, lr) -> (state, metrics)."""

    from podtpu.data.presets import (augment_batch_policy, get_policy,
                                     policy_kwargs)

    policy = get_policy(cfg.data.aug_policy)
    policy_kw = policy_kwargs(cfg)

    def step_fn(state: TrainState, batch: Dict, rng: jax.Array,
                lr: jnp.ndarray):
        rng_aug, rng_model = jax.random.split(rng)
        images, boxes, labels, valid, masks = (
            images_to_float(batch["image"]), batch["boxes"],
            batch["labels"], batch["valid"], batch.get("masks"))
        keypoints = batch.get("keypoints")
        if cfg.data.copy_paste:
            rng_cp, rng_aug = jax.random.split(rng_aug)
            from podtpu.ops.image_ops import copy_paste_batch
            images, boxes, labels, valid, masks = copy_paste_batch(
                rng_cp, images, boxes, labels, valid, masks)
        images, boxes, valid, masks, keypoints = augment_batch_policy(
            policy, rng_aug, images, boxes, valid, masks=masks,
            keypoints=keypoints, **policy_kw)
        gt = {"boxes": boxes, "labels": labels, "valid": valid}
        if masks is not None:
            gt["masks"] = masks
        if keypoints is not None:
            gt["keypoints"] = keypoints
        if "image_weight" in batch:
            gt["image_weight"] = batch["image_weight"]

        batch_norm = cfg.model.backbone_norm == "batch"

        def loss_fn(params):
            if batch_norm:
                # Trainable-BN trunks: marking `frozen` mutable is the
                # training signal (see FrozenBatchNorm.trainable); the
                # updated running stats ride the aux output into the new
                # state.
                losses, muts = model.apply(
                    {"params": params, "frozen": state.frozen}, images,
                    gt=gt, train=True, rng=rng_model, mutable=["frozen"])
                return sum(losses.values()), (losses, muts["frozen"])
            losses = model.apply({"params": params, "frozen": state.frozen},
                                 images, gt=gt, train=True, rng=rng_model)
            return sum(losses.values()), (losses, state.frozen)

        (total, (losses, new_frozen)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        from podtpu.train.optim import apply_optimizer
        params, opt_state = apply_optimizer(tx, grads, state.opt_state,
                                            state.params, lr)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["lr"] = lr
        new_state = TrainState(params=params, frozen=new_frozen,
                               opt_state=opt_state, step=state.step + 1)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model: FasterRCNN):
    """Jitted inference step: (variables, images) -> Detections [+ masks]."""

    def step_fn(params, frozen, images):
        # uint8 -> float happens inside the model's _features (next to
        # mean/std), so raw uint8 canvases are valid input here.
        return model.apply({"params": params, "frozen": frozen},
                           images, train=False)

    return jax.jit(step_fn)


def warmup_factor(cfg: Config, epoch: int, it: int, iters_in_epoch: int) -> float:
    """Linear warmup on epoch 0 only (reference engine/engine.py:18-25:
    factor 1/1000 -> 1 over min(1000, len(loader)-1) iterations)."""
    if epoch != 0:
        return 1.0
    total = min(cfg.train.warmup_iters, max(iters_in_epoch - 1, 1))
    if it >= total:
        return 1.0
    alpha = it / total
    return cfg.train.warmup_start_factor * (1 - alpha) + alpha
