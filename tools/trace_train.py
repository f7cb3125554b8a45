"""Capture a device trace of the full train step and print top HLO ops by
device self-time (xplane parse).  The definitive attribution.
"""
import glob
import json
import os

import jax
import jax.numpy as jnp

TRACE_DIR = "/tmp/train_trace"


def main():
    try:
        from tools.bench_common import train_setup
    except ImportError:  # run as `python tools/trace_train.py`
        from bench_common import train_setup

    _, _, state, step, batch = train_setup()
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
