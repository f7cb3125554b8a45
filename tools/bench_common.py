"""Shared rig for the tools/ benchmark scripts: ONE builder for the
flagship train-step setup and ONE synthetic batch matching the production
train() contract (including ``image_weight``), so a batch-field change
cannot silently miss a profiling script.

Run scripts from anywhere with ``PYTHONPATH=/root/repo:/root/.axon_site``
— they do ``from tools.bench_common import ...`` (or plain
``bench_common`` when invoked as ``python tools/<script>.py``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.models.detector import FasterRCNN, init_variables
from podtpu.train.optim import make_optimizer
from podtpu.train.step import create_train_state, make_train_step

BATCH, CANVAS = 4, 1024


def synthetic_batch(batch=BATCH, canvas=CANVAS, max_gt=100, seed=0,
                    image_dtype=jnp.float32):
    """The 8-field batch dict the production train step consumes."""
    rng = np.random.default_rng(seed)
    gxy = rng.uniform(0, canvas * 0.7, (batch, max_gt, 2)).astype(np.float32)
    gwh = rng.uniform(16, canvas * 0.2, (batch, max_gt, 2)).astype(np.float32)
    return {
        "image": jnp.asarray(
            rng.uniform(0, 1, (batch, canvas, canvas, 3)), image_dtype),
        "boxes": jnp.asarray(np.concatenate([gxy, gxy + gwh], -1)),
        "labels": jnp.asarray(rng.integers(1, 3, (batch, max_gt)),
                              jnp.int32),
        "valid": jnp.asarray(rng.uniform(0, 1, (batch, max_gt)) < 0.2),
        "scale": jnp.ones((batch,), jnp.float32),
        "original_size": jnp.full((batch, 2), canvas, jnp.int32),
        "index": jnp.arange(batch, dtype=jnp.int32),
        # Production train() always sends per-image loss weights
        # (wrap-around masking): include them so the measured program is
        # the one training actually runs.
        "image_weight": jnp.ones((batch,), jnp.float32),
    }


def train_setup(batch=BATCH, canvas=CANVAS, data_kw=None, **model_kw):
    """(model, cfg, state, jitted step, batch dict) at the bench operating
    point; ``model_kw`` / ``data_kw`` override config fields."""
    base = dict(num_classes=3, image_size=(canvas, canvas),
                compute_dtype="bfloat16")
    base.update(model_kw)
    # A/B harness hook: PODTPU_BENCH_MODEL_KW='{"rpn_pack_levels": true}'
    # overrides ModelConfig fields without editing every tools/ script.
    import json as _json
    import os as _os
    env_kw = _os.environ.get("PODTPU_BENCH_MODEL_KW")
    if env_kw:
        base.update(_json.loads(env_kw))
    train_kw = dict(batch_size=batch)
    env_tkw = _os.environ.get("PODTPU_BENCH_TRAIN_KW")
    if env_tkw:
        train_kw.update(_json.loads(env_tkw))
    model_cfg = ModelConfig(**base)
    cfg = Config(model=model_cfg, train=TrainConfig(**train_kw),
                 data=DataConfig(**(data_kw or {})))
    model = FasterRCNN(cfg=model_cfg)
    variables = init_variables(model, jax.random.key(0))
    tx = make_optimizer(cfg.train, cfg.model)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)
    bd = synthetic_batch(batch, canvas, model_cfg.max_gt_boxes)
    return model, cfg, state, step, bd


def stepper(step, state, batch, lr=0.005):
    """``step_once(i)`` closure threading the donated state through a
    holder; returns the loss array (fetchable by slope_time)."""

    holder = {"state": state}

    def step_once(i):
        holder["state"], m = step(holder["state"], batch,
                                  jax.random.fold_in(jax.random.key(1), i),
                                  jnp.float32(lr))
        return m["loss"]

    return step_once
