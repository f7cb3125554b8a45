"""Headline benchmark: Faster R-CNN R50-FPN training throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Set BENCH_METRIC=tiles to instead measure the auto-annotation path's tile
throughput (batched eval forward at the tiled-inference shape) — the north
star's "auto-annotate tiles/sec" metric.

Set BENCH_METRIC=e2e to measure END-TO-END training throughput including
the host pipeline: JPEG decode + resize + batch assembly through
``podtpu.data.loader.Loader`` feeding the same jitted train step (VERDICT
weak #2: the synthetic-batch number could hide a loader bottleneck).  Also
reports the loader-wait fraction.

Baseline: the reference publishes no numbers (BASELINE.md) — the comparison
anchor is the estimated single-A100 throughput of the reference's de-facto
operating point (torchvision Faster R-CNN R50-FPN fine-tune). Public
torchvision recipe timing puts V100 at ~10-12 img/s and A100 at roughly 2x
that; we use A100 ~= 20 images/sec as the denominator.  The north-star
target (BASELINE.json) is vs_baseline >= 2.0 at batch 4.

The measurement excludes host IO (synthetic on-device batch): it is the
sustained jitted train-step throughput — augmentation + forward + loss +
backward + SGD update — at batch 4, 1024x1024, bf16 compute.
"""
import json
import os
import time

A100_BASELINE_IMG_PER_SEC = 20.0


def _train_kw():
    """BENCH_TRAIN_KW='{"fused_sgd": true, "momentum_dtype": "bfloat16"}'
    merges TrainConfig overrides into both the synthetic and e2e metrics
    (the tools/ scripts' PODTPU_BENCH_TRAIN_KW analog)."""
    kw = os.environ.get("BENCH_TRAIN_KW")
    return json.loads(kw) if kw else {}
# A100 eval-forward estimate for the same model/size (~3x train throughput).
A100_BASELINE_TILES_PER_SEC = 60.0

BATCH = 4
CANVAS = 1024


def bench_tiles():
    """Eval-forward throughput at the tiled-inference operating point.

    BENCH_TILES_BATCH overrides the tile batch (throughput metric — the
    auto-annotation path batches tiles freely; default 8, matching
    infer_tiled's default: on tunneled links the per-dispatch RPC amortises
    over the batch, measured 99 -> 139 tiles/s going 4 -> 8)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from podtpu.core.config import ModelConfig
    from podtpu.models.detector import FasterRCNN, init_variables
    from podtpu.train.step import make_eval_step

    batch = int(os.environ.get("BENCH_TILES_BATCH", 8))
    model_cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                            compute_dtype="bfloat16")
    model = FasterRCNN(cfg=model_cfg)
    variables = init_variables(model, jax.random.key(0))
    eval_step = make_eval_step(model)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.uniform(0, 1, (batch, CANVAS, CANVAS, 3)),
                        jnp.float32)
    params, frozen = variables["params"], variables["frozen"]

    from podtpu.core.profiling import slope_time

    per_step = slope_time(
        lambda i: eval_step(params, frozen, tiles).scores, iters=(2, 12),
        reps=2)
    tiles_per_sec = batch / per_step
    # Per-batch p50 latency (includes the ~30ms tunnel RPC on remote-TPU
    # setups; the throughput number above uses slope timing to cancel it).
    lat = []
    for _ in range(8):
        t0 = time.perf_counter()
        det = eval_step(params, frozen, tiles)
        _ = float(det.scores.sum())
        lat.append(time.perf_counter() - t0)
    p50_ms = sorted(lat)[len(lat) // 2] * 1e3
    print(json.dumps({
        "metric": "auto_annotate_tiles_per_sec_1024",
        "value": round(tiles_per_sec, 2),
        "unit": "tiles/sec",
        "vs_baseline": round(tiles_per_sec / A100_BASELINE_TILES_PER_SEC, 3),
        "p50_batch_ms": round(p50_ms, 1),
    }))


def bench_e2e():
    """Loader-included training throughput on a synthetic on-disk dataset."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from podtpu.data.dataset import DetectionDataset
    from podtpu.data.loader import Loader
    from podtpu.models.detector import FasterRCNN, init_variables
    from podtpu.train.optim import make_optimizer
    from podtpu.train.step import create_train_state, make_train_step
    from tests.synthetic import make_project

    n_images = int(os.environ.get("BENCH_E2E_IMAGES", "64"))
    root = tempfile.mkdtemp(prefix="podtpu_bench_")
    project = make_project(root, num_images=n_images,
                           image_size=(CANVAS, CANVAS), max_boxes=8)

    model_cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                            compute_dtype="bfloat16")
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH, **_train_kw()),
                 data=DataConfig())
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes)
    # Same loader selection as train(): device-resident dataset when it
    # fits HBM (no per-step image upload), else the streaming Loader.
    # BENCH_E2E_STREAM=1 forces the streaming path for comparison.
    from podtpu.data import device_cache as dcache

    stream_mode = os.environ.get("BENCH_E2E_STREAM", "")
    use_device_cache = not stream_mode and dcache.fits(dataset)
    # Mirror train()'s gate: a dataset past the HBM budget defaults to the
    # windowed streaming loader (what train() would select), with
    # BENCH_E2E_STREAM=loader as the explicit host-Loader baseline.
    windowed = (bool(stream_mode) and stream_mode != "loader") or (
        not stream_mode and not use_device_cache)
    if use_device_cache:
        cache = dcache.DeviceDataCache(dataset, device=jax.devices()[0])
        loader = dcache.DeviceLoader(cache, BATCH, shuffle=True, raw=True)
    elif windowed:
        # The >HBM streaming path: double-buffered window uploads +
        # in-step gather.  Simulate a dataset larger than the budget by
        # capping each window at a quarter of the image count (so the
        # epoch crosses several window swaps).
        per = dcache.dataset_device_bytes(
            1, model_cfg.image_size, model_cfg.max_gt_boxes)
        budget = 2 * per * max(BATCH, n_images // 4)
        loader = dcache.WindowedStreamLoader(dataset, BATCH, shuffle=True,
                                             budget_bytes=budget)
    else:
        # BENCH_E2E_STREAM=loader: the plain host-Loader baseline.
        place = jax.devices()[0] if os.environ.get("BENCH_E2E_PREFETCH") \
            else None
        loader = Loader(dataset, BATCH, shuffle=True, num_workers=4,
                        prefetch=3, place=place)

    model = FasterRCNN(cfg=model_cfg)
    variables = init_variables(model, jax.random.key(0))
    tx = make_optimizer(cfg.train, cfg.model)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)
    if use_device_cache or windowed:
        cached_step = dcache.make_cached_train_step(
            step, gather=cfg.train.cache_gather)

    # K-steps-per-dispatch (the product train() gate: device-cache mode
    # only) — per-dispatch RPC latency is the measured residue between
    # synthetic and loader-included throughput.
    multi = None
    if use_device_cache and cfg.train.steps_per_dispatch > 1:
        multi = dcache.make_cached_multi_step(
            step, cfg.train.steps_per_dispatch,
            gather=cfg.train.cache_gather)

    def run_step(state, payload, bvalid, it):
        if use_device_cache:
            return cached_step(state, cache.arrays, payload.astype(np.int32),
                               bvalid.astype(np.float32),
                               jax.random.fold_in(key, it), lr)
        if windowed:
            return cached_step(state, loader.arrays,
                               payload.astype(np.int32),
                               bvalid.astype(np.float32),
                               jax.random.fold_in(key, it), lr)
        batch = dict(payload)
        batch["image_weight"] = bvalid.astype(np.float32)
        return step(state, batch, jax.random.fold_in(key, it), lr)

    def run_group(state, group, it0):
        if len(group) > 1:
            idx = np.stack([p.astype(np.int32) for p, _ in group])
            w = np.stack([v.astype(np.float32) for _, v in group])
            rngs = jax.random.split(jax.random.fold_in(key, it0),
                                    len(group))
            lrs = np.full((len(group),), lr, np.float32)
            state, metrics = multi(state, cache.arrays, idx, w, rngs, lrs)
            return state, {k: v[-1] for k, v in metrics.items()}
        return run_step(state, *group[0], it0)

    key = jax.random.key(1)
    lr = np.float32(0.005)
    from podtpu.train.train import _dispatch_groups
    k_dispatch = cfg.train.steps_per_dispatch if multi is not None else 1

    # Warmup epoch: compiles + fills the decoded-canvas cache (run the FULL
    # epoch so the timed phase measures steady state, which is what every
    # epoch after the first looks like in real training).
    metrics = None
    for it, group in enumerate(_dispatch_groups(loader, k_dispatch)):
        state, metrics = run_group(state, group, it)
    _ = float(metrics["loss"])

    # Timed epochs: wall time + loader-wait split.  The window must be
    # long enough to amortise the FIXED tunnel costs it includes (the
    # pipeline-fill RPC of the first dispatch and the final metrics
    # drain, ~30 ms RTT each): at the default 64 images a 2-epoch window
    # is ~3.2 s of device work, so those ~100 ms inflated the per-step
    # cost ~3% (round-5 j75: 39.6 wall vs 41.3 slope on the same
    # program).  4 epochs keeps the same metric definition (sustained
    # loader-included throughput) with half the fixed-cost share.
    epochs = int(os.environ.get("BENCH_E2E_EPOCHS", "4"))
    t_start = time.perf_counter()
    wait = 0.0
    n = 0
    for ep in range(epochs):
        loader.set_epoch(ep + 1)
        it = iter(_dispatch_groups(loader, k_dispatch))
        while True:
            t0 = time.perf_counter()
            try:
                group = next(it)
            except StopIteration:
                break
            wait += time.perf_counter() - t0
            state, metrics = run_group(state, group, 100 + n)
            n += BATCH * len(group)
    _ = float(metrics["loss"])  # drain the device pipeline
    total = time.perf_counter() - t_start
    img_per_sec = n / total
    mode = ("device_cache" if use_device_cache
            else "windowed_stream" if windowed else "host_loader")
    print(json.dumps({
        "metric": "train_images_per_sec_e2e_b4_1024",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
        "loader_wait_frac": round(wait / total, 3),
        "mode": mode,
    }))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from podtpu.models.detector import FasterRCNN, init_variables
    from podtpu.train.optim import make_optimizer
    from podtpu.train.step import create_train_state, make_train_step

    model_cfg = ModelConfig(
        num_classes=3,
        image_size=(CANVAS, CANVAS),
        compute_dtype="bfloat16",
    )
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH, **_train_kw()),
                 data=DataConfig())

    model = FasterRCNN(cfg=model_cfg)
    rng = np.random.default_rng(0)
    variables = init_variables(model, jax.random.key(0))
    tx = make_optimizer(cfg.train, cfg.model)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)

    g = model_cfg.max_gt_boxes
    xy = rng.uniform(0, CANVAS * 0.7, (BATCH, g, 2)).astype(np.float32)
    wh = rng.uniform(16, CANVAS * 0.2, (BATCH, g, 2)).astype(np.float32)
    batch = {
        "image": jnp.asarray(
            rng.uniform(0, 1, (BATCH, CANVAS, CANVAS, 3)), jnp.float32),
        "boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1)),
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

    key = jax.random.key(1)
    lr = np.float32(0.005)
    # Warmup (compile + first steps); the host fetch forces execution
    # (block_until_ready is unreliable over the remote-TPU tunnel).
    holder = {"state": state}
    for i in range(3):
        holder["state"], metrics = step(holder["state"], batch,
                                        jax.random.fold_in(key, i), lr)
    _ = float(metrics["loss"])

    from podtpu.core.profiling import slope_time

    def step_once(i):
        # The state threads through a holder (the step donates its input).
        holder["state"], m = step(holder["state"], batch,
                                  jax.random.fold_in(key, 100 + i), lr)
        return m["loss"]

    # Slope timing cancels the fixed tunnel round-trip latency; min-of-4
    # with a longer slope window keeps one co-scheduled host hiccup from
    # moving the recorded number (the step is ~0.1 s, so the extra reps
    # cost ~3 s total).
    per_step = slope_time(step_once, iters=(2, 14), reps=4)
    img_per_sec = BATCH / per_step
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip_b4_1024",
        "value": round(img_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(img_per_sec / A100_BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    # Persistent XLA compile cache: a warm second run starts in seconds
    # instead of re-compiling for minutes on remote-compile TPU setups.
    from podtpu.core.setup import enable_compilation_cache
    enable_compilation_cache()
    if os.environ.get("BENCH_METRIC") == "tiles":
        bench_tiles()
    elif os.environ.get("BENCH_METRIC") == "e2e" \
            or os.environ.get("BENCH_E2E_STREAM"):
        # BENCH_E2E_STREAM implies the e2e metric: the flag only selects a
        # loader for bench_e2e, so requiring BENCH_METRIC=e2e alongside it
        # silently measured the synthetic step instead (observed footgun).
        bench_e2e()
    else:
        main()
