"""Real-TPU validation + timing of the multi-RoI-per-step RoIAlign kernels:
fwd/bwd vs the XLA reference path (pool_rois_batched with the Pallas flag
off), and slope-timed fwd+bwd at the operating shapes.
"""
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import ModelConfig
from podtpu.models import roi_heads as rh
from podtpu.core.profiling import slope_time

BATCH, CANVAS = 4, 1024




def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg_pl = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                         use_pallas_roi_align=True)
    cfg_xla = dataclasses.replace(cfg_pl, use_pallas_roi_align=False)
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(
        rng.uniform(-1, 1, (BATCH, CANVAS // s, CANVAS // s, 256)),
        jnp.float32) for s in strides]
    for k in (512, 1000):
        xy = rng.uniform(0, CANVAS * 0.8, (BATCH, k, 2)).astype(np.float32)
        wh = rng.uniform(8, CANVAS * 0.15, (BATCH, k, 2)).astype(np.float32)
        rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))

        p_fn = jax.jit(lambda f, b: rh.pool_rois_batched(f, b, cfg_pl))
        x_fn = jax.jit(lambda f, b: rh.pool_rois_batched(f, b, cfg_xla))
        got = np.asarray(p_fn(feats, rois))
        want = np.asarray(x_fn(feats, rois))
        print(json.dumps({"k": k,
                          "fwd_max_err": float(np.abs(got - want).max())}),
              flush=True)

        gp = jax.jit(jax.grad(lambda f: jnp.sum(
            rh.pool_rois_batched(f, rois, cfg_pl) ** 2)))(feats)
        gx = jax.jit(jax.grad(lambda f: jnp.sum(
            rh.pool_rois_batched(f, rois, cfg_xla) ** 2)))(feats)
        gerr = max(float(jnp.abs(a - b).max()) for a, b in zip(gp, gx))
        scale = max(float(jnp.abs(g).max()) for g in gx)
        print(json.dumps({"k": k, "bwd_max_err": gerr,
                          "bwd_rel": gerr / max(scale, 1e-9)}), flush=True)

        bf16 = [f.astype(jnp.bfloat16) for f in feats]
        fwdbwd = jax.jit(jax.grad(lambda f: jnp.sum(
            rh.pool_rois_batched(f, rois, cfg_pl).astype(jnp.float32) ** 2)))

        def tree_norm():
            g = fwdbwd(bf16)
            return jnp.stack([jnp.sum(x.astype(jnp.float32) ** 2)
                              for x in g])

        ms = slope_time(lambda i: tree_norm()) * 1e3
        print(json.dumps({"k": k, "pallas_fwdbwd_ms": round(ms, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
