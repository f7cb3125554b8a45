"""Real-TPU validation + timing of the blockwise Pallas NMS kernel:
exactness vs the python oracle, and latency on random vs adversarial
(chained / clustered) inputs at several sizes.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.ops.pallas.nms_kernel import nms_fixpoint_pallas
from podtpu.core.profiling import slope_time


def nms_oracle(boxes, scores, thresh, valid=None):
    n = len(boxes)
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(n, bool)
    kept = []
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if valid is not None and not valid[i]:
            continue
        ok = True
        for j in kept:
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(x2 - x1, 0.0) * max(y2 - y1, 0.0)
            union = areas[i] + areas[j] - inter
            if union > 0 and inter / union > thresh:
                ok = False
                break
        if ok:
            kept.append(i)
            keep[i] = True
    return keep




def cases(n, rng):
    x = 4.0 * np.arange(n, dtype=np.float32)
    chain = np.stack([x, np.zeros(n, np.float32), x + 10,
                      np.full(n, 10, np.float32)], 1)
    cx = rng.uniform(40, 60, n).astype(np.float32)
    w = rng.uniform(20, 40, n).astype(np.float32)
    cluster = np.stack([cx - w / 2, cx - w / 2, cx + w / 2, cx + w / 2], 1)
    rx = rng.uniform(0, 900, (n, 2)).astype(np.float32)
    rw = rng.uniform(8, 120, (n, 2)).astype(np.float32)
    rand = np.concatenate([rx, rx + rw], 1)
    return {"chain": chain, "cluster": cluster, "random": rand}


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for n in (512, 1024, 2048, 4096):
        for name, boxes in cases(n, rng).items():
            scores = -np.arange(n, dtype=np.float32)
            jb = jnp.asarray(boxes)
            keep = np.asarray(nms_fixpoint_pallas(jb, jnp.ones(n, bool), 0.3))
            if n <= 1024:
                want = nms_oracle(boxes, scores, 0.3)
                exact = bool(np.array_equal(keep, want))
            else:
                exact = None
            ms = slope_time(
                lambda i, jb=jb, n=n: nms_fixpoint_pallas(
                    jb, jnp.ones(n, bool), 0.3)) * 1e3
            print(json.dumps({"n": n, "case": name, "ms": round(ms, 3),
                              "kept": int(keep.sum()), "exact": exact}),
                  flush=True)


if __name__ == "__main__":
    main()
