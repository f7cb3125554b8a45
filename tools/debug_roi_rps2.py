"""At the failing shape (k=512, canvas 1024): rps=1 vs rps=8 vs XLA ref."""
import os
import json

import numpy as np

import jax
import jax.numpy as jnp

from podtpu.core.config import ModelConfig
from podtpu.models import roi_heads as rh

BATCH, CANVAS = 4, 1024


def main():
    import dataclasses
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg_pl = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                         use_pallas_roi_align=True)
    cfg_xla = dataclasses.replace(cfg_pl, use_pallas_roi_align=False)
    strides = (4, 8, 16, 32)
    feats = [jnp.asarray(
        rng.uniform(-1, 1, (BATCH, CANVAS // s, CANVAS // s, 256)),
        jnp.float32) for s in strides]
    k = 512
    xy = rng.uniform(0, CANVAS * 0.8, (BATCH, k, 2)).astype(np.float32)
    wh = rng.uniform(8, CANVAS * 0.15, (BATCH, k, 2)).astype(np.float32)
    rois_np = np.concatenate([xy, xy + wh], -1)
    rois = jnp.asarray(rois_np)

    want = np.asarray(jax.jit(
        lambda f, b: rh.pool_rois_batched(f, b, cfg_xla))(feats, rois))

    outs = {}
    for rps in (1, 8):
        os.environ["PODTPU_ROI_RPS"] = str(rps)
        fn = jax.jit(lambda f, b: rh.pool_rois_batched(f, b, cfg_pl))
        outs[rps] = np.asarray(fn(feats, rois))
        err = np.abs(outs[rps] - want)
        per_roi = err.reshape(BATCH, k, -1).max(-1)
        bad = np.argwhere(per_roi > 1e-2)
        print(json.dumps({"rps": rps, "vs_xla_max_err": float(err.max()),
                          "n_bad_rois": int(len(bad))}), flush=True)
        for bi, ki in bad[:5]:
            print(json.dumps({"roi": rois_np[bi, ki].tolist(),
                              "err": float(per_roi[bi, ki])}), flush=True)
    d = np.abs(outs[1] - outs[8])
    print(json.dumps({"rps1_vs_rps8_max_err": float(d.max())}), flush=True)


if __name__ == "__main__":
    main()
