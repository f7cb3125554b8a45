"""A/B the space-to-depth stem in the full train step."""
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.models.detector import FasterRCNN, init_variables
from podtpu.train.optim import make_optimizer
from podtpu.train.step import create_train_state, make_train_step
from podtpu.core.profiling import slope_time

BATCH, CANVAS = 4, 1024




def bench(s2d):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (BATCH, CANVAS, CANVAS, 3)),
                         jnp.float32)
    model_cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                            compute_dtype="bfloat16",
                            stem_space_to_depth=s2d)
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH),
                 data=DataConfig())
    model = FasterRCNN(cfg=model_cfg)
    variables = init_variables(model, jax.random.key(0))
    tx = make_optimizer(cfg.train, cfg.model)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)
    g = model_cfg.max_gt_boxes
    gxy = rng.uniform(0, CANVAS * 0.7, (BATCH, g, 2)).astype(np.float32)
    gwh = rng.uniform(16, CANVAS * 0.2, (BATCH, g, 2)).astype(np.float32)
    batch = {
        "image": images,
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
    holder = {"state": state}

    def step_once(i):
        holder["state"], m = step(holder["state"], batch,
                                  jax.random.fold_in(jax.random.key(1), i),
                                  jnp.float32(0.005))
        return m["loss"]

    ms = slope_time(step_once) * 1e3
    print(json.dumps({"s2d": s2d, "train_step_ms": round(ms, 2),
                      "img_per_sec": round(BATCH / ms * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench(False)
    bench(True)
