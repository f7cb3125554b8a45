"""Attribution of the train step remainder: RPN head convs, RPN losses
(match+sample), proposal selection, RoI sampling + box head, optimizer.
One JSON line per part at the bench operating point.
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.models import roi_heads as rh
from podtpu.models import rpn as rpn_lib
from podtpu.models.rpn import RPNHead
from podtpu.ops.anchors import grid_anchors
from podtpu.train.optim import make_optimizer
from podtpu.core.profiling import slope_time

BATCH, CANVAS = 4, 1024




def report(name, secs):
    print(json.dumps({"part": name, "ms": round(secs * 1e3, 2)}), flush=True)


def scalarize(tree):
    return sum(jnp.sum(l.astype(jnp.float32) ** 2)
               for l in jax.tree.leaves(tree))


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                      compute_dtype="bfloat16")

    pyr5 = [jnp.asarray(rng.uniform(-1, 1,
                                    (BATCH, CANVAS // s, CANVAS // s, 256)),
                        jnp.bfloat16) for s in (4, 8, 16, 32, 64)]

    # ---- RPN head convs fwd+bwd ----
    head = RPNHead(num_anchors=3, channels=256)
    hvars = head.init(jax.random.key(0), [p[:1] for p in pyr5])

    @jax.jit
    def head_fwdbwd(params, feats):
        def loss(p):
            logits, deltas = head.apply({"params": p}, feats)
            return (sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in logits)
                    + sum(jnp.sum(d.astype(jnp.float32) ** 2)
                          for d in deltas))
        return scalarize(jax.grad(loss)(params))

    hp = hvars["params"]
    report("rpn_head_fwdbwd",
           slope_time(lambda i: head_fwdbwd(hp, pyr5)))

    # ---- RPN losses (match + balanced sample + bce/l1), fwd+bwd ----
    grids = grid_anchors((CANVAS, CANVAS), tuple(cfg.strides),
                         tuple(cfg.anchor_sizes), tuple(cfg.anchor_ratios))
    anchors = [jnp.asarray(g) for g in grids]
    all_anchors = jnp.concatenate(anchors, axis=0)
    level_logits = [jnp.asarray(rng.normal(size=(BATCH, a.shape[0]))
                                .astype(np.float32)) for a in anchors]
    level_deltas = [jnp.asarray(
        rng.normal(scale=0.1, size=(BATCH, a.shape[0], 4)).astype(np.float32))
        for a in anchors]
    g = cfg.max_gt_boxes
    gxy = rng.uniform(0, CANVAS * 0.7, (BATCH, g, 2)).astype(np.float32)
    gwh = rng.uniform(16, CANVAS * 0.2, (BATCH, g, 2)).astype(np.float32)
    gt_boxes = jnp.asarray(np.concatenate([gxy, gxy + gwh], -1))
    gt_valid = jnp.asarray(rng.uniform(0, 1, (BATCH, g)) < 0.2)

    @jax.jit
    def rpn_loss_fwdbwd(logits, deltas, key):
        def loss(args):
            lg, dl = args
            o, b = rpn_lib.rpn_losses(key, lg, dl, all_anchors, gt_boxes,
                                      gt_valid, cfg)
            return o + b
        return scalarize(jax.grad(loss)((logits, deltas)))

    report("rpn_losses_fwdbwd", slope_time(
        lambda i: rpn_loss_fwdbwd(level_logits, level_deltas,
                                  jax.random.key(i))))

    # ---- select_proposals (train mode) ----
    sel = jax.jit(lambda lg, dl: rpn_lib.select_proposals(
        lg, dl, anchors, cfg, train=True))
    report("rpn_select_train", slope_time(
        lambda i: sel(level_logits, level_deltas)))

    # ---- sample_rois + box head losses fwd+bwd ----
    p = cfg.rpn_post_nms_topk_train
    pxy = rng.uniform(0, CANVAS * 0.8, (BATCH, p, 2)).astype(np.float32)
    pwh = rng.uniform(8, CANVAS * 0.2, (BATCH, p, 2)).astype(np.float32)
    props = jnp.asarray(np.concatenate([pxy, pxy + pwh], -1))
    pvalid = jnp.ones((BATCH, p), bool)

    @jax.jit
    def sample_only(key):
        rngs = jax.random.split(key, BATCH)
        sampled = jax.vmap(
            lambda r, pb, pv, gb, gl, gv: rh.sample_rois(
                r, pb, pv, gb, gl, gv, cfg)
        )(rngs, props, pvalid, gt_boxes,
          jnp.ones((BATCH, g), jnp.int32), gt_valid)
        return scalarize(sampled.boxes)

    report("sample_rois", slope_time(lambda i: sample_only(
        jax.random.key(i))))

    # ---- box head fwd+bwd on pooled features ----
    from podtpu.models.roi_heads import BoxHead
    bh = BoxHead(num_classes=3, dtype=jnp.bfloat16)
    pooled = jnp.asarray(rng.normal(size=(BATCH * 512, 7, 7, 256)),
                         jnp.bfloat16)
    bvars = bh.init(jax.random.key(1), pooled[:8])

    @jax.jit
    def bh_fwdbwd(params, x):
        def loss(pp):
            lg, dl = bh.apply({"params": pp}, x)
            return (jnp.sum(lg.astype(jnp.float32) ** 2)
                    + jnp.sum(dl.astype(jnp.float32) ** 2))
        return scalarize(jax.grad(loss)(params))

    bp = bvars["params"]
    report("box_head_fwdbwd", slope_time(
        lambda i: bh_fwdbwd(bp, pooled)))

    # ---- optimizer update on full param tree ----
    from podtpu.models.detector import FasterRCNN, init_variables
    from podtpu.train.step import create_train_state
    model = FasterRCNN(cfg=cfg)
    variables = init_variables(model, jax.random.key(0))
    tcfg = Config(model=cfg, train=TrainConfig(batch_size=BATCH),
                  data=DataConfig())
    tx = make_optimizer(tcfg.train, tcfg.model)
    state = create_train_state(variables, tx)
    grads = jax.tree.map(jnp.ones_like, state.params)

    @jax.jit
    def opt_update(st, gr, lr):
        opt_state = st.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(gr, opt_state, st.params)
        import optax
        params = optax.apply_updates(st.params, updates)
        return scalarize(params)

    report("optimizer_update", slope_time(
        lambda i: opt_update(state, grads, jnp.float32(0.001 + i * 1e-9))))


if __name__ == "__main__":
    main()
