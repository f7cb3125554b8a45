"""Per-HLO diff of the cached train step on NOISE vs BENCH-PROJECT data.

j83/j84 (docs/runs/r05): the identical cached-step dispatch structure
sustains 40.5 img/s on random uint8 arrays but 39.7 on the e2e bench's
decoded synthetic project — ~1 ms/step of workload-data-dependent device
time, and the NMS fixpoint unroll did not move it.  This tool captures a
device trace of the SAME compiled program on both datasets (fresh state,
20 warmup steps on each so the RPN adapts to its data, then a 4-step
trace) and prints the largest per-HLO self-time differences — the
definitive attribution for where structured data costs more.
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_totals(trace_dir):
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for plane in xspace.planes:
        if plane.name != "/device:TPU:0":
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        totals = {}
        for line in plane.lines:
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                totals[name] = totals.get(name, 0) + ev.duration_ps
        return totals
    return {}


def main():
    import tempfile

    import jax
    import jax.numpy as jnp

    from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
    from podtpu.core.setup import enable_compilation_cache
    from podtpu.data import device_cache as dcache
    from podtpu.data.dataset import DetectionDataset
    from podtpu.models.detector import FasterRCNN, init_variables
    from podtpu.train.optim import make_optimizer
    from podtpu.train.step import create_train_state, make_train_step
    from tests.synthetic import make_project

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
    cached = dcache.make_cached_train_step(step, gather=cfg.train.cache_gather)
    dev = jax.devices()[0]
    key = jax.random.key(1)
    lr = np.float32(0.005)
    g = model_cfg.max_gt_boxes

    # Noise arrays (probe_e2e_wall's default data).
    xy = rng.uniform(0, CANVAS * 0.7, (N, g, 2)).astype(np.float32)
    wh = rng.uniform(16, CANVAS * 0.2, (N, g, 2)).astype(np.float32)
    noise = {
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

    # The e2e bench's project.
    root = tempfile.mkdtemp(prefix="podtpu_trace_")
    project = make_project(root, num_images=N, image_size=(CANVAS, CANVAS),
                           max_boxes=8)
    dataset = DetectionDataset(project, image_size=model_cfg.image_size,
                               max_gt=model_cfg.max_gt_boxes)
    bench = dcache.DeviceDataCache(dataset, device=dev).arrays

    w1 = jax.device_put(np.ones((BATCH,), np.float32), dev)
    results = {}
    for tag, arrays in (("noise", noise), ("bench", bench)):
        state = create_train_state(
            jax.tree_util.tree_map(jnp.array, variables), tx)
        r = np.random.default_rng(7)
        for i in range(20):
            idx = jax.device_put(
                r.choice(N, BATCH, replace=False).astype(np.int32), dev)
            state, m = cached(state, arrays, idx, w1,
                              jax.random.fold_in(key, i), lr)
        _ = float(m["loss"])
        trace_dir = f"/tmp/cached_trace_{tag}"
        with jax.profiler.trace(trace_dir):
            for i in range(4):
                idx = jax.device_put(
                    r.choice(N, BATCH, replace=False).astype(np.int32), dev)
                state, m = cached(state, arrays, idx, w1,
                                  jax.random.fold_in(key, 100 + i), lr)
            _ = float(m["loss"])
        totals = parse_totals(trace_dir)
        results[tag] = totals
        print(json.dumps({"trace": tag, "device_total_ms": round(
            sum(totals.values()) / 1e9, 2)}), flush=True)

    names = set(results["noise"]) | set(results["bench"])
    diffs = sorted(
        ((results["bench"].get(nm, 0) - results["noise"].get(nm, 0), nm)
         for nm in names), key=lambda kv: -abs(kv[0]))
    for d, nm in diffs[:25]:
        print(json.dumps({
            "diff_ms": round(d / 1e9, 3),
            "bench_ms": round(results["bench"].get(nm, 0) / 1e9, 3),
            "noise_ms": round(results["noise"].get(nm, 0) / 1e9, 3),
            "op": nm[:120]}), flush=True)


if __name__ == "__main__":
    main()
