"""Bisect the multi-RoI RoIAlign bug: compare rps=1 vs 2/4/8 on-device at a
tiny shape, report where outputs diverge.
"""
import os
import json

import numpy as np

import jax
import jax.numpy as jnp


def run(rps, feats, rois, strides):
    os.environ["PODTPU_ROI_RPS"] = str(rps)
    # Re-import path resolves rps at call time (it reads env per call).
    from podtpu.ops.pallas.roi_align_kernel import batched_roi_align_pallas
    fn = jax.jit(lambda f, b: batched_roi_align_pallas(f, b, strides),
                 static_argnums=())
    out = np.asarray(fn(feats, rois))
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    strides = (4, 8, 16, 32)
    size = 256
    feats = tuple(jnp.asarray(
        rng.uniform(-1, 1, (2, size // s, size // s, 256)), jnp.float32)
        for s in strides)
    k = 16
    xy = rng.uniform(0, size * 0.7, (2, k, 2)).astype(np.float32)
    wh = rng.uniform(8, size * 0.25, (2, k, 2)).astype(np.float32)
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))

    base = run(1, feats, rois, strides)
    for rps in (2, 4, 8):
        out = run(rps, feats, rois, strides)
        err = np.abs(out - base)
        per_roi = err.reshape(2, k, -1).max(-1)
        print(json.dumps({
            "rps": rps,
            "max_err": float(err.max()),
            "bad_rois_img0": np.flatnonzero(per_roi[0] > 1e-3).tolist(),
            "bad_rois_img1": np.flatnonzero(per_roi[1] > 1e-3).tolist(),
        }), flush=True)


if __name__ == "__main__":
    main()
