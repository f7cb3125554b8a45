"""Data-parallel training over a device mesh.

TPU-native replacement for the reference's NCCL/DDP stack
(`miso/object_detection/engine/utils.py:260-283` init_process_group +
DistributedDataParallel wrap `engine/train.py:226-229`): instead of
rank-process orchestration with framework-inserted gradient allreduce, the
train step runs under ``shard_map`` over a ``jax.sharding.Mesh`` — each
device computes loss/grads on its batch shard, gradients are combined with an
explicit ``lax.pmean`` over the ``data`` axis (the DP allreduce, riding ICI),
and the optimizer update runs replicated.  Multi-host extends the same mesh
over DCN via ``jax.distributed.initialize`` (see ``initialize_distributed``).

The mesh is built with a (data,) axis but the helpers accept extra trailing
axes so model-sharding strategies can slot in later without reshaping the
call sites.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from podtpu.core.config import Config
from podtpu.models.detector import FasterRCNN
from podtpu.train.step import TrainState


def initialize_distributed(**kwargs) -> None:
    """Multi-host bring-up (torchrun/SLURM + NCCL equivalent):
    `jax.distributed.initialize` wires hosts over DCN; in-program collectives
    then ride ICI within a slice automatically."""
    jax.distributed.initialize(**kwargs)


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def make_dp_per_shard(model: FasterRCNN, tx, cfg: Config,
                      axis_name: str = "data"):
    """The per-device body of the DP train step (augment + forward + loss +
    grad + pmean allreduce + update) — shared between the streaming path
    (`make_dp_train_step`) and the sample-sharded device cache
    (`podtpu.data.device_cache.make_sharded_cached_dp_train_step`)."""
    from podtpu.data.presets import (augment_batch_policy, get_policy,
                                     policy_kwargs)

    policy = get_policy(cfg.data.aug_policy)
    policy_kw = policy_kwargs(cfg)

    def per_shard(state: TrainState, batch: Dict, rng: jax.Array, lr):
        # Distinct augmentation / sampler streams per shard.
        shard_idx = jax.lax.axis_index(axis_name)
        rng = jax.random.fold_in(rng, shard_idx)
        rng_aug, rng_model = jax.random.split(rng)
        from podtpu.train.step import images_to_float
        images, boxes, labels, valid, masks = (
            images_to_float(batch["image"]), batch["boxes"],
            batch["labels"], batch["valid"], batch.get("masks"))
        keypoints = batch.get("keypoints")
        if cfg.data.copy_paste:
            from podtpu.ops.image_ops import copy_paste_batch
            rng_cp, rng_aug = jax.random.split(rng_aug)
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
                # Trainable-BN trunks (see FrozenBatchNorm.trainable):
                # normalisation uses LOCAL shard batch stats (torch DDP
                # non-sync-BN semantics); the running stats are pmean'd
                # below so the replicated-state invariant holds.
                losses, muts = model.apply(
                    {"params": params, "frozen": state.frozen}, images,
                    gt=gt, train=True, rng=rng_model, mutable=["frozen"])
                return sum(losses.values()), (losses, muts["frozen"])
            losses = model.apply({"params": params, "frozen": state.frozen},
                                 images, gt=gt, train=True, rng=rng_model)
            return sum(losses.values()), (losses, state.frozen)

        (total, (losses, new_frozen)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        # The DP allreduce: mean gradients (and metrics) across shards.
        grads = jax.lax.pmean(grads, axis_name)
        losses = jax.lax.pmean(losses, axis_name)
        total = jax.lax.pmean(total, axis_name)
        if batch_norm:
            new_frozen = jax.lax.pmean(new_frozen, axis_name)

        from podtpu.train.optim import apply_optimizer
        params, opt_state = apply_optimizer(tx, grads, state.opt_state,
                                            state.params, lr)
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["lr"] = lr
        return TrainState(params=params, frozen=new_frozen,
                          opt_state=opt_state, step=state.step + 1), metrics

    return per_shard


def make_dp_train_step(model: FasterRCNN, tx, cfg: Config, mesh: Mesh,
                       axis_name: str = "data"):
    """Build the sharded train step.

    Batch arrays are sharded along ``data``; state is replicated.  Returns
    ``(step_fn, shard_batch)`` where ``shard_batch`` places a host batch onto
    the mesh with the right sharding.
    """
    batch_spec = P(axis_name)
    replicated = P()
    per_shard = make_dp_per_shard(model, tx, cfg, axis_name)

    # batch_spec is a pytree prefix: every array in the batch dict shards
    # along the data axis.
    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(replicated, batch_spec, replicated, replicated),
        out_specs=(replicated, replicated),
        check_vma=False)

    step_fn = jax.jit(sharded, donate_argnums=(0,))

    def shard_batch(batch: Dict):
        spec_batch = NamedSharding(mesh, batch_spec)
        return {k: jax.device_put(v, spec_batch) for k, v in batch.items()}

    return step_fn, shard_batch


def make_dp_eval_step(model: FasterRCNN, mesh: Mesh, axis_name: str = "data"):
    """Sharded inference step: batch split over devices, detections gathered."""
    batch_spec = P(axis_name)

    def per_shard(params, frozen, images):
        # uint8 -> float happens inside the model's _features.
        return model.apply({"params": params, "frozen": frozen},
                           images, train=False)

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), P(), batch_spec),
        out_specs=batch_spec,
        check_vma=False)
    return jax.jit(sharded)
