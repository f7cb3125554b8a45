"""A/B TPU compiler options on the full train step via the AOT compile
path (client-side XLA_FLAGS cannot reach a tunneled TPU backend; per-
program ``compiler_options`` can).  One JSON line per variant.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.core.profiling import slope_time
from podtpu.models.detector import FasterRCNN, init_variables
from podtpu.train.optim import make_optimizer
from podtpu.train.step import create_train_state, make_train_step

BATCH, CANVAS = 4, 1024

VARIANTS = {
    "baseline": None,
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "sched_rerun": {"xla_latency_hiding_scheduler_rerun": "3"},
}


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    model_cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                            compute_dtype="bfloat16")
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH),
                 data=DataConfig())
    model = FasterRCNN(cfg=model_cfg)
    variables = init_variables(model, jax.random.key(0))
    tx = make_optimizer(cfg.train, cfg.model)
    state0 = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)
    g = model_cfg.max_gt_boxes
    gxy = rng.uniform(0, CANVAS * 0.7, (BATCH, g, 2)).astype(np.float32)
    gwh = rng.uniform(16, CANVAS * 0.2, (BATCH, g, 2)).astype(np.float32)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (BATCH, CANVAS, CANVAS, 3)),
                             jnp.float32),
        "boxes": jnp.asarray(np.concatenate([gxy, gxy + gwh], -1)),
        "labels": jnp.asarray(rng.integers(1, 3, (BATCH, g)), jnp.int32),
        "valid": jnp.asarray(rng.uniform(0, 1, (BATCH, g)) < 0.2),
        "scale": jnp.ones((BATCH,), jnp.float32),
        "original_size": jnp.full((BATCH, 2), CANVAS, jnp.int32),
        "index": jnp.arange(BATCH, dtype=jnp.int32),
        # Production train() always sends per-image loss weights
        # (wrap-around masking): include them so the measured
        # program is the one training actually runs.
        "image_weight": jnp.ones((BATCH,), jnp.float32),
    }
    rng_key = jax.random.key(1)
    lowered = step.lower(state0, batch, rng_key, jnp.float32(0.005))
    # The step donates its state argument: snapshot on host so every
    # variant starts from an intact copy.
    state_host = jax.tree.map(np.asarray, state0)

    for name, opts in VARIANTS.items():
        try:
            compiled = lowered.compile(compiler_options=opts)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        holder = {"state": jax.device_put(
            jax.tree.map(jnp.asarray, state_host), jax.devices()[0])}

        def step_once(i, compiled=compiled, holder=holder):
            holder["state"], m = compiled(holder["state"], batch,
                                          jax.random.fold_in(rng_key, i),
                                          jnp.float32(0.005))
            return m["loss"]

        try:
            ms = slope_time(step_once) * 1e3
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"variant": name, "ms": round(ms, 2),
                          "img_per_sec": round(BATCH / ms * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
