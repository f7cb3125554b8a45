"""Attribution of the (slow) eval forward: RPN select vs RoI pool vs
postprocess vs raw NMS.  One JSON line per part.

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/profile_eval_parts.py > /tmp/prof_eval.log 2>&1 &
"""
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import ModelConfig
from podtpu.models import roi_heads as rh
from podtpu.models import rpn as rpn_lib
from podtpu.ops.anchors import grid_anchors
from podtpu.ops.nms import nms_keep
from podtpu.core.profiling import slope_time

BATCH, CANVAS = 4, 1024




def report(name, secs):
    print(json.dumps({"part": name, "ms": round(secs * 1e3, 2)}), flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                      compute_dtype="bfloat16")

    # ---- raw NMS kernel: single instance n=1024 ----
    n = 1024
    xy = rng.uniform(0, 900, (n, 2)).astype(np.float32)
    wh = rng.uniform(8, 120, (n, 2)).astype(np.float32)
    boxes1 = jnp.asarray(np.concatenate([xy, xy + wh], -1))
    scores1 = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))

    nms1 = jax.jit(lambda b, s: nms_keep(b, s, 0.5))
    report("nms_single_1024", slope_time(lambda i: nms1(boxes1, scores1)))

    # ---- vmapped NMS x8 (the postprocess shape: B*C-1 instances) ----
    boxes8 = jnp.asarray(rng.uniform(0, 900, (8, n, 4)).astype(np.float32))
    bwh = jnp.asarray(rng.uniform(8, 120, (8, n, 2)).astype(np.float32))
    boxes8 = boxes8.at[..., 2:].set(boxes8[..., :2] + bwh)
    scores8 = jnp.asarray(rng.uniform(0, 1, (8, n)).astype(np.float32))
    nms8 = jax.jit(jax.vmap(lambda b, s: nms_keep(b, s, 0.5)))
    report("nms_vmap8_1024", slope_time(lambda i: nms8(boxes8, scores8)))

    # ---- vmapped NMS x20 (the RPN eval shape: B*L instances) ----
    boxes20 = jnp.tile(boxes8, (3, 1, 1))[:20]
    scores20 = jnp.tile(scores8, (3, 1))[:20]
    nms20 = jax.jit(jax.vmap(lambda b, s: nms_keep(b, s, 0.7)))
    report("nms_vmap20_1024", slope_time(lambda i: nms20(boxes20, scores20)))

    # ---- postprocess_detections alone (vmapped over batch) ----
    p, c = 1000, 3
    logits = jnp.asarray(rng.normal(size=(BATCH, p, c)).astype(np.float32))
    deltas = jnp.asarray(
        rng.normal(scale=0.1, size=(BATCH, p, c * 4)).astype(np.float32))
    pxy = rng.uniform(0, 900, (BATCH, p, 2)).astype(np.float32)
    pwh = rng.uniform(8, 120, (BATCH, p, 2)).astype(np.float32)
    props = jnp.asarray(np.concatenate([pxy, pxy + pwh], -1))
    pvalid = jnp.ones((BATCH, p), bool)

    post = jax.jit(jax.vmap(
        lambda lg, dl, pb, pv: rh.postprocess_detections(lg, dl, pb, pv, cfg)))
    report("postprocess_b4", slope_time(lambda i: post(logits, deltas, props,
                                                       pvalid)))

    # ---- RPN select_proposals (eval config) ----
    grids = grid_anchors((CANVAS, CANVAS), tuple(cfg.strides),
                         tuple(cfg.anchor_sizes), tuple(cfg.anchor_ratios))
    anchors = [jnp.asarray(g) for g in grids]
    level_logits = [jnp.asarray(rng.normal(size=(BATCH, a.shape[0]))
                                .astype(np.float32)) for a in anchors]
    level_deltas = [jnp.asarray(
        rng.normal(scale=0.1, size=(BATCH, a.shape[0], 4)).astype(np.float32))
        for a in anchors]

    sel = jax.jit(functools.partial(rpn_lib.select_proposals, cfg=cfg,
                                    train=False))
    report("rpn_select_eval", slope_time(
        lambda i: sel(level_logits, level_deltas, anchors)))

    # ---- RoIAlign fwd-only at eval shape (4 x 1000 rois) ----
    pyr = [jnp.asarray(rng.uniform(-1, 1,
                                   (BATCH, CANVAS // s, CANVAS // s, 256)),
                       jnp.bfloat16) for s in (4, 8, 16, 32)]
    rxy = rng.uniform(0, 900, (BATCH, 1000, 2)).astype(np.float32)
    rwh = rng.uniform(8, 200, (BATCH, 1000, 2)).astype(np.float32)
    rois = jnp.asarray(np.concatenate([rxy, rxy + rwh], -1))
    pool = jax.jit(lambda f, b: jnp.sum(
        rh.pool_rois_batched(f, b, cfg).astype(jnp.float32) ** 2))
    report("roi_align_fwd_4x1000", slope_time(lambda i: pool(pyr, rois)))


if __name__ == "__main__":
    main()
