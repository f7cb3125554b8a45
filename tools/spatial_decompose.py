"""Decompose the spatial-partitioning work-division overhead (VERDICT r4
weak #7 / ask #6).

The round-4 probe (`tools/bench_spatial.py`, `docs/runs/r04/bench_spatial
.log`) recorded per-device FLOPs at 18.49% of the single-device program
against a 12.5% ideal on an 8-way height-sharded 1024 canvas — ~68%
parallel efficiency — without saying WHERE the 6-point overhead sits.
This tool splits the program into three nested prefixes and runs XLA's
(backend-independent) cost analysis on each, single-device vs
spatially-sharded:

  features   backbone + FPN                       (sharded convs + halo)
  proposals  + RPN head convs + top-k/NMS select  (partly global)
  full       + RoIAlign + box head + postprocess  (global / replicated)

For each slice of work (features, proposals-minus-features,
full-minus-proposals) it reports the per-device share of that slice's
single-device FLOPs: ~1/N means the slice partitions, ~1.0 means it is
replicated on every device.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      PYTHONPATH=/root/repo python tools/spatial_decompose.py [canvas] [devices]
"""
import json
import os
import sys

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from podtpu.core.config import ModelConfig
from podtpu.models.detector import FasterRCNN, init_variables
from podtpu.parallel.spatial import spatial_mesh


def flops(jitted, *args):
    stats = jitted.lower(*args).compile().cost_analysis()
    if isinstance(stats, list):
        stats = stats[0]
    return float(stats.get("flops", float("nan")))


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

    def features_fn(m, images):
        return m._features(images)

    def proposals_fn(m, images):
        return m(images, train=False, return_proposals=True)

    def full_fn(m, images):
        return m(images, train=False)

    stages = {"features": features_fn, "proposals": proposals_fn,
              "full": full_fn}

    def run(images_sharding=None, constrain=False, mesh=None):
        out = {}
        for name, fn in stages.items():
            def apply_fn(p, f, x, fn=fn):
                if constrain:
                    from podtpu.models.fpn import set_feature_constraint
                    from podtpu.parallel.spatial import make_spatial_eval_step  # noqa: F401

                    def constrain_feature(t):
                        h = t.shape[1]
                        spec = P(None, "sp") if (h >= n and h % n == 0) \
                            else P()
                        return jax.lax.with_sharding_constraint(
                            t, NamedSharding(mesh, spec))

                    x = jax.lax.with_sharding_constraint(
                        x, images_sharding)
                    prev = set_feature_constraint(constrain_feature)
                    try:
                        return model.apply({"params": p, "frozen": f}, x,
                                           method=fn)
                    finally:
                        set_feature_constraint(prev)
                return model.apply({"params": p, "frozen": f}, x,
                                   method=fn)

            if images_sharding is not None:
                repl = NamedSharding(mesh, P())
                jitted = jax.jit(apply_fn,
                                 in_shardings=(repl, repl, images_sharding),
                                 out_shardings=repl)
            else:
                jitted = jax.jit(apply_fn)
            out[name] = flops(jitted, params, frozen, img)
        return out

    single = run()
    mesh = spatial_mesh(jax.devices()[:n])
    sp = run(images_sharding=NamedSharding(mesh, P(None, "sp")),
             constrain=True, mesh=mesh)

    # Slice the nested prefixes into disjoint work components.
    def slices(d):
        return {
            "conv_stack": d["features"],
            "rpn_select": d["proposals"] - d["features"],
            "roi_heads": d["full"] - d["proposals"],
        }

    s1, sn = slices(single), slices(sp)
    report = {"probe": "spatial_decompose", "backend": jax.default_backend(),
              "canvas": canvas, "devices": n,
              "ideal_fraction": round(1.0 / n, 4),
              "full_per_device_fraction": round(sp["full"] / single["full"],
                                                4)}
    for k in s1:
        report[k] = {
            "single_gflops": round(s1[k] / 1e9, 2),
            "per_device_gflops": round(sn[k] / 1e9, 2),
            # Share of this slice's single-device work each device runs:
            # ~1/N = partitions, ~1.0 = replicated everywhere.
            "per_device_share": round(sn[k] / max(s1[k], 1e-9), 4),
            # Contribution to the whole-program per-device overhead
            # beyond ideal 1/N, in points of the single-device total.
            "overhead_points": round(
                100 * (sn[k] - s1[k] / n) / single["full"], 2),
        }

    # The remedy: the product spatial step with the RoI stage sharded
    # over BOXES (make_spatial_eval_step(shard_rois=True)) vs replicated.
    from podtpu.parallel.spatial import make_spatial_eval_step

    for shard_rois in (False, True):
        step = make_spatial_eval_step(model, mesh, shard_rois=shard_rois)
        f = flops(step, params, frozen, img)
        report[f"product_step_shard_rois_{shard_rois}"] = {
            "per_device_gflops": round(f / 1e9, 2),
            "per_device_fraction": round(f / single["full"], 4),
        }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
