"""Component-level step-time attribution on the real TPU.

Times each tier of the train step at the bench operating point (batch 4,
1024x1024, bf16) with the slope method (run 2 vs 12 iterations; the
difference cancels the tunnel RPC latency).  Prints one JSON line per
component so perf work can target the actual bottleneck (VERDICT #3).

Run:  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/profile_components.py > /tmp/prof.log 2>&1 &
"""
import json

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.models.detector import FasterRCNN, init_variables
from podtpu.models.fpn import FPN
from podtpu.models.resnet import ResNet
from podtpu.train.optim import make_optimizer
from podtpu.core.profiling import slope_time
from podtpu.train.step import create_train_state, make_eval_step, \
    make_train_step

BATCH, CANVAS = 4, 1024




def scalarize(tree):
    """Reduce a pytree to one fp32 scalar INSIDE the jitted program: keeps
    every leaf live (no DCE of the backward pass) while the host fetch is
    4 bytes instead of the full 100MB+ gradient tree over the tunnel."""
    import jax as _jax
    return sum(jnp.sum(l.astype(jnp.float32) ** 2)
               for l in _jax.tree.leaves(tree))


def report(name, secs):
    print(json.dumps({"component": name, "ms": round(secs * 1e3, 2),
                      "img_per_sec": round(BATCH / secs, 2)}), flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (BATCH, CANVAS, CANVAS, 3)),
                         jnp.float32)

    model_cfg = ModelConfig(num_classes=3, image_size=(CANVAS, CANVAS),
                            compute_dtype="bfloat16")

    # ---- backbone only, fwd+bwd ----
    backbone = ResNet(stage_sizes=(3, 4, 6, 3), dtype=jnp.bfloat16,
                      trainable_stages=3)
    bvars = backbone.init(jax.random.key(0), images[:1])
    bparams, bfrozen = bvars["params"], bvars.get("frozen", {})

    @jax.jit
    def bb_fwdbwd(params, imgs):
        def loss(p):
            outs = backbone.apply({"params": p, "frozen": bfrozen}, imgs)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return scalarize(jax.grad(loss)(params))

    report("backbone_fwdbwd",
           slope_time(lambda i: bb_fwdbwd(bparams, images)))

    # ---- backbone + FPN, fwd+bwd ----
    fpn = FPN(out_channels=256, dtype=jnp.bfloat16)
    c2345 = backbone.apply({"params": bparams, "frozen": bfrozen}, images[:1])
    fvars = fpn.init(jax.random.key(1), c2345)

    @jax.jit
    def bbfpn_fwdbwd(params, fparams, imgs):
        def loss(pf):
            p, f = pf
            outs = backbone.apply({"params": p, "frozen": bfrozen}, imgs)
            pyr = fpn.apply({"params": f}, outs)
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in pyr)
        return scalarize(jax.grad(loss)((params, fparams)))

    report("backbone_fpn_fwdbwd",
           slope_time(lambda i: bbfpn_fwdbwd(bparams, fvars["params"],
                                           images)))

    # ---- stem conv alone (C=3 7x7s2: the classic low-MXU suspect) ----
    from flax import linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                           use_bias=False, dtype=jnp.bfloat16)(x)

    stem = Stem()
    svars = stem.init(jax.random.key(2), images[:1])

    @jax.jit
    def stem_fwdbwd(params, imgs):
        def loss(p):
            return jnp.sum(stem.apply({"params": p}, imgs)
                           .astype(jnp.float32) ** 2)
        return scalarize(jax.grad(loss)(params))

    report("stem_conv_fwdbwd",
           slope_time(lambda i: stem_fwdbwd(svars["params"], images)))

    # ---- RoIAlign at operating shape (4 x 512 rois, P2..P5) ----
    from podtpu.models import roi_heads as rh
    model = FasterRCNN(cfg=model_cfg)
    variables = init_variables(model, jax.random.key(0))
    pyramid_shapes = [(BATCH, CANVAS // s, CANVAS // s, 256)
                      for s in (4, 8, 16, 32)]
    pyr = [jnp.asarray(rng.uniform(-1, 1, s), jnp.bfloat16)
           for s in pyramid_shapes]
    xy = rng.uniform(0, CANVAS * 0.8, (BATCH, 512, 2)).astype(np.float32)
    wh = rng.uniform(8, CANVAS * 0.2, (BATCH, 512, 2)).astype(np.float32)
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))

    @jax.jit
    def roi_fwdbwd(feats, boxes):
        def loss(f):
            pooled = rh.pool_rois_batched(f, boxes, model_cfg)
            return jnp.sum(pooled.astype(jnp.float32) ** 2)
        return scalarize(jax.grad(loss)(feats))

    report("roi_align_fwdbwd_4x512",
           slope_time(lambda i: roi_fwdbwd(pyr, rois)))

    # ---- augmentation alone (miso policy incl. photometric) ----
    from podtpu.data.presets import augment_batch_policy, get_policy
    policy = get_policy("miso")
    boxes4 = jnp.asarray(np.concatenate(
        [xy[:, :100], xy[:, :100] + wh[:, :100]], -1))
    valid4 = jnp.ones((BATCH, 100), bool)

    @jax.jit
    def aug_only(key, imgs, bxs, vld):
        i2, b2, v2, _, _ = augment_batch_policy(policy, key, imgs, bxs, vld,
                                             distort=True)
        return i2.sum() + b2.sum()

    report("augment_miso",
           slope_time(lambda i: aug_only(jax.random.key(i), images, boxes4,
                                         valid4)))

    # ---- eval (inference) step ----
    eval_step = make_eval_step(model)
    params, frozen = variables["params"], variables["frozen"]
    report("eval_forward",
           slope_time(lambda i: eval_step(params, frozen, images)))

    # ---- full train step (baseline) ----
    try:
        from tools.bench_common import stepper, synthetic_batch
    except ImportError:
        from bench_common import stepper, synthetic_batch
    cfg = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH),
                 data=DataConfig())
    tx = make_optimizer(cfg.train, cfg.model)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg)
    batch = synthetic_batch(BATCH, CANVAS, model_cfg.max_gt_boxes)
    batch["image"] = images
    report("train_step_full", slope_time(stepper(step, state, batch)))

    # ---- train step without augmentation ----
    cfg2 = Config(model=model_cfg, train=TrainConfig(batch_size=BATCH),
                  data=DataConfig(aug_policy="none"))
    step2 = make_train_step(model, tx, cfg2)
    variables2 = init_variables(model, jax.random.key(0))
    state2 = create_train_state(variables2, tx)
    report("train_step_noaug", slope_time(stepper(step2, state2, batch)))


if __name__ == "__main__":
    main()
