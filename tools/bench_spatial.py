"""Timing probe for the spatial-partitioning path (VERDICT r2 weak #3:
"no perf evidence for the spatial path at all").

Measures the spatially-sharded eval forward (one giant canvas, height
split over the mesh) against the single-device forward at the same shape.

HARDWARE CAVEAT: this environment exposes ONE real TPU chip, so a real
multi-chip ICI measurement is impossible here.  The probe therefore runs
on the virtual 8-device CPU mesh (JAX_PLATFORMS=cpu,
--xla_force_host_platform_device_count=N) — which measures the GSPMD
partitioning overhead/scaling structure (halo exchange, gather points),
NOT TPU wall-clock.  On a real v5e-8 the same program rides ICI; run this
probe there for the production number.  What the CPU mesh CAN establish:
(a) the partitioned program runs and scales with devices, (b) compilation
has no involuntary-full-rematerialization replication (asserted on the
compile log by tests/test_spatial.py + the driver's MULTICHIP dryrun).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python tools/bench_spatial.py [canvas] [devices]
"""
import json
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import jax
import numpy as np

from podtpu.core.config import ModelConfig
from podtpu.models.detector import FasterRCNN, init_variables
from podtpu.parallel.spatial import make_spatial_eval_step, spatial_mesh
from podtpu.train.step import make_eval_step


def timeit(fn, reps=3):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    canvas = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    cfg = ModelConfig(num_classes=3, image_size=(canvas, canvas),
                      compute_dtype="bfloat16")
    model = FasterRCNN(cfg=cfg)
    variables = init_variables(model, jax.random.key(0))
    params, frozen = variables["params"], variables["frozen"]
    rng = np.random.default_rng(0)
    img = np.asarray(rng.uniform(0, 1, (1, canvas, canvas, 3)), np.float32)

    single = make_eval_step(model)
    t1 = timeit(lambda: single(params, frozen, img).scores)

    mesh = spatial_mesh(jax.devices()[:n])
    spatial = make_spatial_eval_step(model, mesh)
    tn = timeit(lambda: spatial(params, frozen, img).scores)

    # Compiler-verified work division: per-device FLOPs of the partitioned
    # program vs the single-device program.  On the virtual CPU mesh the
    # wall-clock comparison is meaningless (all 8 "devices" contend for the
    # same host cores while the single-device program already multithreads
    # across them), but XLA's cost analysis is backend-independent: a
    # per-device ratio near 1/N certifies that on a real N-chip slice each
    # chip runs ~1/N of the model (plus halo/replicated-head overhead).
    def flops(jitted, *args):
        stats = jitted.lower(*args).compile().cost_analysis()
        if isinstance(stats, list):
            stats = stats[0]
        return float(stats.get("flops", float("nan")))

    f1 = flops(single, params, frozen, img)
    fn_dev = flops(spatial, params, frozen, img)

    print(json.dumps({
        "probe": "spatial_eval_forward",
        "backend": jax.default_backend(),
        "canvas": canvas,
        "devices": n,
        "single_device_s": round(t1, 3),
        "spatial_s": round(tn, 3),
        "cpu_mesh_wallclock_meaningful": jax.default_backend() != "cpu",
        "single_device_gflops": round(f1 / 1e9, 2),
        "spatial_per_device_gflops": round(fn_dev / 1e9, 2),
        "per_device_work_fraction": round(fn_dev / f1, 4),
        "ideal_fraction": round(1.0 / n, 4),
    }))


if __name__ == "__main__":
    main()
