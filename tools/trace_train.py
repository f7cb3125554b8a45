"""Capture a device trace of the full train step and print top HLO ops by
device self-time (xplane parse).  The definitive attribution.
"""
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

BATCH, CANVAS = 4, 1024
TRACE_DIR = "/tmp/train_trace"


def main():
    from podtpu.core.config import Config, DataConfig, ModelConfig, \
        TrainConfig
    from podtpu.models.detector import FasterRCNN, init_variables
    from podtpu.train.optim import make_optimizer
    from podtpu.train.step import create_train_state, make_train_step

    rng = np.random.default_rng(0)
    model_cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                            compute_dtype="bfloat16")
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH),
                 data=DataConfig())
    model = FasterRCNN(cfg=model_cfg)
    variables = init_variables(model, jax.random.key(0))
    tx = make_optimizer(cfg.train, cfg.model)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)
    g = model_cfg.max_gt_boxes
    gxy = rng.uniform(0, CANVAS * 0.7, (BATCH, g, 2)).astype(np.float32)
    gwh = rng.uniform(16, CANVAS * 0.2, (BATCH, g, 2)).astype(np.float32)
    batch = {
        "image": jnp.asarray(rng.uniform(0, 1, (BATCH, CANVAS, CANVAS, 3)),
                             jnp.float32),
        "boxes": jnp.asarray(np.concatenate([gxy, gxy + gwh], -1)),
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
    for i in range(3):
        state, m = step(state, batch, jax.random.fold_in(key, i),
                        jnp.float32(0.005))
    _ = float(m["loss"])
    with jax.profiler.trace(TRACE_DIR):
        for i in range(2):
            state, m = step(state, batch, jax.random.fold_in(key, 10 + i),
                            jnp.float32(0.005))
        _ = float(m["loss"])
    print("trace captured", flush=True)

    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # proto moved between TF releases
        from tensorflow.core.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    xspace = xplane_pb2.XSpace()
    xspace.ParseFromString(open(sorted(paths)[-1], "rb").read())
    for plane in xspace.planes:
        if plane.name != "/device:TPU:0":
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        totals, counts = {}, {}
        for line in plane.lines:
            for ev in line.events:
                name = emeta.get(ev.metadata_id, "?")
                totals[name] = totals.get(name, 0) + ev.duration_ps
                counts[name] = counts.get(name, 0) + 1
        grand = sum(totals.values())
        print(json.dumps({"device_total_ms": round(grand / 1e9, 1)}),
              flush=True)
        for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:50]:
            print(json.dumps({"ms": round(ps / 1e9, 3),
                              "x": counts[name],
                              "op": name[:130]}), flush=True)


if __name__ == "__main__":
    main()
