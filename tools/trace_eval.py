"""Capture a jax.profiler trace of the slow eval forward and print the top
HLO ops by device self-time, parsed straight from the xplane proto.
"""
import glob
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

BATCH, CANVAS = 4, 1024
TRACE_DIR = "/tmp/eval_trace"


def run_and_trace(proposals_only=True):
    from podtpu.core.config import ModelConfig
    from podtpu.models.detector import FasterRCNN, init_variables

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (BATCH, CANVAS, CANVAS, 3)),
                         jnp.float32)
    cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                      compute_dtype="bfloat16")
    model = FasterRCNN(cfg=cfg)
    variables = init_variables(model, jax.random.key(0))
    params, frozen = variables["params"], variables["frozen"]
    fn = jax.jit(lambda p, f, im: model.apply(
        {"params": p, "frozen": f}, im, train=False,
        return_proposals=proposals_only))

    out = fn(params, frozen, images)  # compile
    jax.tree.leaves(jax.device_get(out))
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(2):
            out = fn(params, frozen, images)
        jax.tree.leaves(jax.device_get(out))
    print("trace captured", flush=True)


def parse():
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # proto moved between TF releases
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                      recursive=True)
    print("xplane files:", paths, flush=True)
    totals = {}
    plane_names = []
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as fp:
            xspace.ParseFromString(fp.read())
        for plane in xspace.planes:
            plane_names.append(plane.name)
            if "TPU" not in plane.name and "device" not in plane.name.lower():
                continue
            emeta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    name = emeta.get(ev.metadata_id, "?")
                    totals[name] = totals.get(name, 0.0) + ev.duration_ps
    print("planes:", plane_names[:20], flush=True)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
    for name, ps in top:
        print(json.dumps({"op": name[:110], "ms": round(ps / 1e9, 3)}),
              flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        parse()
    else:
        run_and_trace(proposals_only=os.environ.get("FULL") != "1")
        parse()
