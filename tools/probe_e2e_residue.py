"""Decompose the e2e-vs-synthetic residue (round 5).

The device-cache e2e bench trails the synthetic step 39.3 vs 40.5 img/s
at <=0.1% loader wait, and K-steps-per-dispatch moved it only +0.2% — so
the residue is NOT dispatch latency.  The remaining structural difference
is inside the cached step: the in-graph ``{k: v[idx]}`` batch gather from
the HBM-resident dataset plus the uint8 image payload (the synthetic
bench feeds an f32 canvas).  This probe slope-times each variant:

  A. plain step, f32 synthetic batch       (the headline number)
  B. plain step, uint8 image batch         (isolates uint8->f32 convert)
  C. cached step (gather in-graph, uint8)  (the e2e program)
  D. gather-only program                   (the gather alone)
  E. cached step with unrolled dynamic-slice gather (lever candidate:
     XLA lowers a [B]-index gather of 3.15 MB rows as a gather HLO; B
     unrolled dynamic slices are contiguous copies)

Reference analog: the vendored trainer's loader/step split
(`miso/object_detection/engine/train.py:184-186`) has no device-resident
path at all; this probe tunes the podtpu-specific tier.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from podtpu.core.profiling import slope_time
    from podtpu.core.setup import enable_compilation_cache
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

    g = model_cfg.max_gt_boxes
    xy = rng.uniform(0, CANVAS * 0.7, (N, g, 2)).astype(np.float32)
    wh = rng.uniform(16, CANVAS * 0.2, (N, g, 2)).astype(np.float32)
    dev = jax.devices()[0]
    arrays = {
        "image": jax.device_put(
            rng.integers(0, 255, (N, CANVAS, CANVAS, 3), np.uint8), dev),
        "boxes": jax.device_put(np.concatenate([xy, xy + wh], -1), dev),
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
    results = {}

    def run(tag, make_state, fn, feed):
        holder = {"state": make_state()}
        for i in range(3):
            holder["state"], m = fn(holder["state"], feed(i), i)
        _ = float(m["loss"])

        def once(i):
            holder["state"], m = fn(holder["state"], feed(100 + i), 100 + i)
            return m["loss"]

        per = slope_time(once, iters=(2, 12), reps=3)
        results[tag] = round(per * 1e3, 2)
        print(json.dumps({"probe": tag, "ms_per_step": results[tag],
                          "img_per_sec": round(BATCH / per, 2)}),
              flush=True)

    def fresh_state():
        return create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), tx)

    # A: plain step, f32 batch (the synthetic headline program).
    f32_batch = {k: (v[:BATCH] if k != "image"
                     else jnp.asarray(v[:BATCH], jnp.float32) / 255.0)
                 for k, v in arrays.items()}
    f32_batch["image_weight"] = jnp.ones((BATCH,), jnp.float32)
    run("A_plain_f32", fresh_state,
        lambda s, b, i: step(s, b, jax.random.fold_in(key, i), lr),
        lambda i: f32_batch)

    # B: plain step, uint8 image (convert happens in-model).
    u8_batch = dict(f32_batch)
    u8_batch["image"] = arrays["image"][:BATCH]
    run("B_plain_uint8", fresh_state,
        lambda s, b, i: step(s, b, jax.random.fold_in(key, i), lr),
        lambda i: u8_batch)

    # C: the production cached step (XLA gather of every field).
    from podtpu.data import device_cache as dcache
    cached = dcache.make_cached_train_step(step)
    w = jnp.ones((BATCH,), jnp.float32)

    def feed_idx(i):
        r = np.random.default_rng(i)
        return jnp.asarray(r.choice(N, BATCH, replace=False).astype(np.int32))

    run("C_cached_gather", fresh_state,
        lambda s, idx, i: cached(s, arrays, idx, w,
                                 jax.random.fold_in(key, i), lr),
        feed_idx)

    # D: the gather alone (same program shape as C's prologue).
    @jax.jit
    def gather_only(arr, idx):
        return {k: v[idx] for k, v in arr.items()}

    out = gather_only(arrays, feed_idx(0))
    _ = np.asarray(out["scale"])
    per = slope_time(
        lambda i: gather_only(arrays, feed_idx(100 + i))["scale"],
        iters=(2, 12), reps=3)
    print(json.dumps({"probe": "D_gather_only",
                      "ms_per_step": round(per * 1e3, 2)}), flush=True)
    results["D_gather_only"] = round(per * 1e3, 2)

    # E: cached step with the gather unrolled into B dynamic slices.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def cached_slices(state, arr, idx, image_weight, rng_, lr_):
        batch = {k: jnp.stack([v[idx[b]] for b in range(BATCH)])
                 for k, v in arr.items()}
        batch["image_weight"] = image_weight
        return step(state, batch, rng_, lr_)

    run("E_cached_dynslice", fresh_state,
        lambda s, idx, i: cached_slices(s, arrays, idx, w,
                                        jax.random.fold_in(key, i), lr),
        feed_idx)

    print(json.dumps({"probe": "summary", **results,
                      "residue_C_minus_A_ms": round(
                          results["C_cached_gather"] - results["A_plain_f32"],
                          2)}), flush=True)


if __name__ == "__main__":
    main()
