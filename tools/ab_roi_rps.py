"""Timing A/B of rois-per-step for the Pallas RoIAlign (fwd+bwd, 4x512)."""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import ModelConfig
from podtpu.models import roi_heads as rh

BATCH, CANVAS = 4, 1024


def slope_time(fn, iters=(2, 12), reps=2):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn()
        jax.tree.leaves(jax.device_get(out))
        return time.perf_counter() - t0

    run(1)
    t_s = min(run(iters[0]) for _ in range(reps))
    t_l = min(run(iters[1]) for _ in range(reps))
    return max((t_l - t_s) / (iters[1] - iters[0]), 1e-9)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS))
    feats = [jnp.asarray(
        rng.uniform(-1, 1, (BATCH, CANVAS // s, CANVAS // s, 256)),
        jnp.bfloat16) for s in (4, 8, 16, 32)]
    k = 512
    xy = rng.uniform(0, CANVAS * 0.8, (BATCH, k, 2)).astype(np.float32)
    wh = rng.uniform(8, CANVAS * 0.15, (BATCH, k, 2)).astype(np.float32)
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))

    for rps in (1, 2, 4, 8):
        os.environ["PODTPU_ROI_RPS"] = str(rps)
        fwdbwd = jax.jit(jax.grad(lambda f: jnp.sum(
            rh.pool_rois_batched(f, rois, cfg).astype(jnp.float32) ** 2)))

        def tree_norm():
            g = fwdbwd(feats)
            return jnp.stack([jnp.sum(x.astype(jnp.float32) ** 2)
                              for x in g])

        ms = slope_time(tree_norm) * 1e3
        print(json.dumps({"rps": rps, "fwdbwd_ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
