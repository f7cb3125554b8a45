"""Wall-clock decomposition of the device-cache e2e loop (round 5 cont.).

j80 measured the committed e2e defaults (slice gather, K=8 dispatch) at
39.63 img/s wall while the same program slope-times at 41.28 img/s
(``j70_gather_mode.log``).  ``slope_time`` takes min-over-reps, an
optimistic floor; the e2e bench is sustained wall.  This probe wall-times
the EXACT dispatch structure of the e2e timed loop with host-side work
ablated, to locate the ~4 ms/step residue:

  P0  multi-step K=8 program, args pre-staged on device, zero host work
      between dispatches        -> sustained wall rate of the program
  P1  multi-step K=8, fresh numpy idx/w + jax.random.split per dispatch
      + per-dispatch metrics[-1] indexing (the e2e loop minus the loader)
  P2  single cached step stream (K=1), device args

If P0 ~= 39.6: the program is genuinely ~101 ms sustained and the gap to
the 96.9 ms min-slope is jitter the wall metric honestly includes.
If P0 ~= 41.3: the residue is the per-dispatch host/arg path.

Reference analog: the vendored trainer's loader/step split
(`miso/object_detection/engine/train.py:184-186`).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from podtpu.core.setup import enable_compilation_cache
    from podtpu.models.detector import FasterRCNN, init_variables
    from podtpu.train.optim import make_optimizer
    from podtpu.train.step import create_train_state, make_train_step
    from podtpu.data import device_cache as dcache

    enable_compilation_cache()
    BATCH, CANVAS, N, K = 4, 1024, 64, 8
    bench_data = "--bench-data" in sys.argv
    EPOCHS = 4                      # same timed window as the e2e bench
    steps_per_epoch = N // BATCH    # 16 -> 2 dispatches/epoch at K=8
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
    if bench_data:
        # --bench-data: the EXACT dataset+cache the e2e bench trains on
        # (structured shapes, not noise) — isolates workload data
        # dependence (NMS fixpoint depth etc.) from loop structure.
        import tempfile

        from podtpu.data.dataset import DetectionDataset
        from tests.synthetic import make_project

        root = tempfile.mkdtemp(prefix="podtpu_probe_")
        project = make_project(root, num_images=N,
                               image_size=(CANVAS, CANVAS), max_boxes=8)
        dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                                   max_gt=model_cfg.max_gt_boxes)
        cache = dcache.DeviceDataCache(dataset, device=dev)
        arrays = cache.arrays
    else:
        arrays = None
    arrays = arrays if arrays is not None else {
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
    gather = cfg.train.cache_gather
    cached = dcache.make_cached_train_step(step, gather=gather)
    multi = dcache.make_cached_multi_step(step, K, gather=gather)
    results = {}

    def report(tag, n_images, seconds):
        rate = n_images / seconds
        results[tag] = round(rate, 2)
        print(json.dumps({"probe": tag, "img_per_sec": round(rate, 2),
                          "ms_per_step": round(
                              seconds / (n_images / BATCH) * 1e3, 2)}),
              flush=True)

    def fresh_state():
        return create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), tx)

    def epoch_args(seed):
        r = np.random.default_rng(seed)
        order = r.permutation(N).astype(np.int32)[:steps_per_epoch * BATCH]
        idx = order.reshape(steps_per_epoch, BATCH)
        return idx.reshape(-1, K, BATCH)  # [groups, K, B]

    w = np.ones((K, BATCH), np.float32)
    lrs = np.full((K,), lr, np.float32)

    # ---- P0: K=8 program, args pre-staged on device, no host work ----
    staged = []
    for ep in range(EPOCHS + 1):
        for gi, idx in enumerate(epoch_args(ep)):
            rngs = jax.random.split(jax.random.fold_in(key, ep * 100 + gi), K)
            staged.append((jax.device_put(idx, dev),
                           jax.device_put(w, dev),
                           jax.device_put(rngs, dev),
                           jax.device_put(lrs, dev)))
    state = fresh_state()
    # warmup epoch (compile + steady state), matching the e2e bench
    n_warm = len(epoch_args(0))
    for a in staged[:n_warm]:
        state, m = multi(state, arrays, *a)
    _ = float(m["loss"][-1])
    t0 = time.perf_counter()
    for a in staged[n_warm:]:
        state, m = multi(state, arrays, *a)
    _ = float(m["loss"][-1])
    report("P0_multi_device_args", EPOCHS * steps_per_epoch * BATCH,
           time.perf_counter() - t0)

    if bench_data:
        print(json.dumps({"probe": "summary", "data": "bench_project",
                          **results}), flush=True)
        return

    # ---- P1: K=8, fresh numpy args + split per dispatch + metrics[-1] ----
    state = fresh_state()
    for gi, idx in enumerate(epoch_args(0)):
        rngs = jax.random.split(jax.random.fold_in(key, gi), K)
        state, m = multi(state, arrays, np.ascontiguousarray(idx), w, rngs,
                         lrs)
    _ = float(m["loss"][-1])
    t0 = time.perf_counter()
    last = None
    for ep in range(1, EPOCHS + 1):
        for gi, idx in enumerate(epoch_args(ep)):
            rngs = jax.random.split(jax.random.fold_in(key, ep * 100 + gi), K)
            state, m = multi(state, arrays, np.ascontiguousarray(idx),
                             w, rngs, lrs)
            last = {k: v[-1] for k, v in m.items()}   # e2e loop's indexing
    _ = float(last["loss"])
    report("P1_multi_numpy_args", EPOCHS * steps_per_epoch * BATCH,
           time.perf_counter() - t0)

    # ---- P2: K=1 stream, device args ----
    flat = [(jax.device_put(i, dev),) for a in range(EPOCHS + 1)
            for i in epoch_args(1000 + a).reshape(-1, BATCH)]
    w1 = jax.device_put(np.ones((BATCH,), np.float32), dev)
    state = fresh_state()
    for (i,) in flat[:steps_per_epoch]:
        state, m = cached(state, arrays, i, w1,
                          jax.random.fold_in(key, 0), lr)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for si, (i,) in enumerate(flat[steps_per_epoch:]):
        state, m = cached(state, arrays, i, w1,
                          jax.random.fold_in(key, si), lr)
    _ = float(m["loss"])
    report("P2_single_device_args", EPOCHS * steps_per_epoch * BATCH,
           time.perf_counter() - t0)

    print(json.dumps({"probe": "summary", **results}), flush=True)


if __name__ == "__main__":
    main()
