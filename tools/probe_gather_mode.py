"""A/B the device-cache gather lowering on the real chip (round 5).

The e2e device-cache bench trails the synthetic step 39.3 vs 40.5 img/s
at <=0.1% loader wait, and K-steps-per-dispatch moved it only +0.2% —
the residue is inside the cached program.  The one structural extra vs
the synthetic step is the in-graph ``{k: v[idx]}`` batch gather of the
uint8 image cache (4 x 3.15 MB rows).  This probe slope-times the
PRODUCTION ``make_cached_train_step`` under both ``cache_gather``
lowerings ('take' = gather HLO, 'slice' = B unrolled dynamic slices) at
the exact bench e2e shapes, so the 'take' compile hits the persistent
cache.  Reference analog: the vendored trainer has no device-resident
tier at all (`miso/object_detection/engine/train.py:184-186`).
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from podtpu.core.profiling import slope_time
    from podtpu.core.setup import enable_compilation_cache
    from podtpu.data import device_cache as dcache
    from podtpu.models.detector import FasterRCNN, init_variables
    from podtpu.train.optim import make_optimizer
    from podtpu.train.step import create_train_state, make_train_step

    enable_compilation_cache()
    BATCH, CANVAS, N = 4, 1024, 64
    rng = np.random.default_rng(0)
    model_cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                            compute_dtype="bfloat16")
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH),
                 data=DataConfig())
    model = FasterRCNN(cfg=model_cfg)
    variables = init_variables(model, jax.random.key(0))
    tx = make_optimizer(cfg.train, cfg.model)
    step = make_train_step(model, tx, cfg)
    print("model built", flush=True)

    g = model_cfg.max_gt_boxes
    xy = rng.uniform(0, CANVAS * 0.7, (N, g, 2)).astype(np.float32)
    wh = rng.uniform(16, CANVAS * 0.2, (N, g, 2)).astype(np.float32)
    dev = jax.devices()[0]
    arrays = {
        "image": jax.device_put(
            rng.integers(0, 255, (N, CANVAS, CANVAS, 3)).astype(np.uint8),
            dev),
        "boxes": jax.device_put(
            np.concatenate([xy, xy + wh], -1).astype(np.float32), dev),
        "labels": jax.device_put(
            rng.integers(1, 3, (N, g)).astype(np.int32), dev),
        "valid": jax.device_put(rng.uniform(0, 1, (N, g)) < 0.2, dev),
        "scale": jax.device_put(np.ones((N,), np.float32), dev),
        "original_size": jax.device_put(
            np.full((N, 2), CANVAS, np.int32), dev),
        "index": jax.device_put(np.arange(N, dtype=np.int32), dev),
    }
    key = jax.random.key(1)
    lr = np.float32(0.005)
    w = jnp.ones((BATCH,), jnp.float32)

    def feed_idx(i):
        r = np.random.default_rng(i)
        return jnp.asarray(r.choice(N, BATCH, replace=False).astype(np.int32))

    results = {}
    for mode in ("take", "slice"):
        cached = dcache.make_cached_train_step(step, gather=mode)
        holder = {"state": create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), tx)}
        for i in range(3):
            holder["state"], m = cached(
                holder["state"], arrays, feed_idx(i), w,
                jax.random.fold_in(key, i), lr)
        _ = float(m["loss"])
        print(f"{mode}: warm", flush=True)

        def once(i):
            holder["state"], m = cached(
                holder["state"], arrays, feed_idx(100 + i), w,
                jax.random.fold_in(key, 100 + i), lr)
            return m["loss"]

        per = slope_time(once, iters=(2, 12), reps=3)
        results[mode] = round(per * 1e3, 2)
        print(json.dumps({"probe": f"cached_{mode}",
                          "ms_per_step": results[mode],
                          "img_per_sec": round(BATCH / per, 2)}), flush=True)

    print(json.dumps({"probe": "summary", **results,
                      "slice_minus_take_ms": round(
                          results["slice"] - results["take"], 2)}),
          flush=True)


if __name__ == "__main__":
    main()
