"""Bisect the composed eval program's cost: proposals-only vs full, and
the pallas-roi / approx-topk toggles.  One JSON line per variant.
"""
import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import ModelConfig
from podtpu.models.detector import FasterRCNN, init_variables
from podtpu.core.profiling import slope_time

BATCH, CANVAS = 4, 1024




def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (BATCH, CANVAS, CANVAS, 3)),
                         jnp.float32)
    base = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                       compute_dtype="bfloat16")
    variables = init_variables(FasterRCNN(cfg=base), jax.random.key(0))
    params, frozen = variables["params"], variables["frozen"]

    def eval_fn(cfg, return_proposals=False):
        model = FasterRCNN(cfg=cfg)
        return jax.jit(lambda p, f, im: model.apply(
            {"params": p, "frozen": f}, im, train=False,
            return_proposals=return_proposals))

    variants = [
        ("proposals_only", base, True),
        ("full_pallas_roi_off", dataclasses.replace(
            base, use_pallas_roi_align=False), False),
        ("full_approx_off", dataclasses.replace(
            base, approx_topk=False), False),
    ]
    for name, cfg, props in variants:
        fn = eval_fn(cfg, props)
        ms = slope_time(lambda i: fn(params, frozen, images)) * 1e3
        print(json.dumps({"variant": name, "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
