"""Optimizer construction (podtpu/train/optim.py)."""
import numpy as np

import jax.numpy as jnp

from podtpu.core.config import ModelConfig, TrainConfig
from podtpu.train.optim import make_optimizer


def _params():
    return {"backbone": {"layer4_0": {"w": jnp.ones((4,))}},
            "box_head": {"w": jnp.ones((3,))}}


def _sgd_update(train_cfg, grads):
    cfg = ModelConfig()
    tx = make_optimizer(train_cfg, cfg)
    params = _params()
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    return updates


class TestClipGradNorm:
    def test_off_by_default(self):
        g = 1000.0
        grads = {"backbone": {"layer4_0": {"w": jnp.full((4,), g)}},
                 "box_head": {"w": jnp.full((3,), g)}}
        upd = _sgd_update(TrainConfig(weight_decay=0.0, momentum=0.0),
                          grads)
        # update = -lr * grad, unclipped.
        np.testing.assert_allclose(np.asarray(upd["box_head"]["w"]),
                                   -0.005 * g, rtol=1e-5)

    def test_clips_global_norm(self):
        g = 1000.0
        grads = {"backbone": {"layer4_0": {"w": jnp.full((4,), g)}},
                 "box_head": {"w": jnp.full((3,), g)}}
        upd = _sgd_update(
            TrainConfig(weight_decay=0.0, momentum=0.0, clip_grad_norm=1.0),
            grads)
        total = np.sqrt(sum(
            float(jnp.sum(v ** 2)) for v in
            [upd["backbone"]["layer4_0"]["w"], upd["box_head"]["w"]]))
        # Clipped to norm 1, then scaled by lr.
        np.testing.assert_allclose(total, 0.005, rtol=1e-4)

    def test_small_grads_untouched(self):
        grads = {"backbone": {"layer4_0": {"w": jnp.full((4,), 0.01)}},
                 "box_head": {"w": jnp.full((3,), 0.01)}}
        upd = _sgd_update(
            TrainConfig(weight_decay=0.0, momentum=0.0,
                        clip_grad_norm=10.0), grads)
        np.testing.assert_allclose(np.asarray(upd["box_head"]["w"]),
                                   -0.005 * 0.01, rtol=1e-5)
