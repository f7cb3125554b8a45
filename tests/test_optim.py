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


class TestFusedSGD:
    """Flat-buffer SGD (TrainConfig.fused_sgd) must reproduce the optax
    chain's trajectory exactly (same math/order; only reduction order in
    the grad norm and memory layout differ)."""

    def _trees(self, seed=0):
        import jax
        rng = np.random.default_rng(seed)
        mk = lambda *s: jnp.asarray(rng.normal(0, 1, s), jnp.float32)
        params = {"backbone": {"conv1": {"kernel": mk(3, 3, 3, 8)},
                               "layer1_0": {"w": mk(8,)},
                               "layer4_0": {"w": mk(4, 4)}},
                  "box_head": {"w": mk(6,), "b": mk(2, 3)}}
        grads = jax.tree.map(lambda x: jnp.asarray(
            rng.normal(0, 2, x.shape), jnp.float32), params)
        # Frozen backbone stages carry stop_gradient in the real models,
        # so their grads are EXACTLY zero (optax.masked passes raw
        # updates through for masked-out leaves — only zero grads make
        # that a no-op, which is the product invariant).
        grads["backbone"]["conv1"]["kernel"] = jnp.zeros((3, 3, 3, 8))
        grads["backbone"]["layer1_0"]["w"] = jnp.zeros((8,))
        return params, grads

    def _run(self, train_cfg, model_cfg, steps=4, seed=0):
        import jax
        from podtpu.train.optim import apply_optimizer
        tx = make_optimizer(train_cfg, model_cfg)
        params, grads = self._trees(seed)
        state = tx.init(params)
        for i in range(steps):
            g = jax.tree.map(lambda x: x * (0.5 + 0.5 * i), grads)
            params, state = apply_optimizer(tx, g, state, params,
                                            jnp.float32(0.01 / (i + 1)))
        return params

    def _assert_same(self, train_kw, model_cfg):
        import jax
        base = self._run(TrainConfig(**train_kw), model_cfg)
        fused = self._run(TrainConfig(fused_sgd=True, **train_kw),
                          model_cfg)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-6, atol=2e-7),
            base, fused)

    def test_matches_optax_chain(self):
        self._assert_same(dict(), ModelConfig())

    def test_matches_with_clip(self):
        self._assert_same(dict(clip_grad_norm=1.0), ModelConfig())

    def test_matches_with_frozen_stages(self):
        model_cfg = ModelConfig(trainable_backbone_stages=3)
        self._assert_same(dict(), model_cfg)
        # And the frozen leaves really were untouched.
        fused = self._run(TrainConfig(fused_sgd=True), model_cfg)
        start, _ = self._trees()
        np.testing.assert_array_equal(
            np.asarray(fused["backbone"]["conv1"]["kernel"]),
            np.asarray(start["backbone"]["conv1"]["kernel"]))
        np.testing.assert_array_equal(
            np.asarray(fused["backbone"]["layer1_0"]["w"]),
            np.asarray(start["backbone"]["layer1_0"]["w"]))
        assert not np.array_equal(
            np.asarray(fused["backbone"]["layer4_0"]["w"]),
            np.asarray(start["backbone"]["layer4_0"]["w"]))

    def test_bf16_momentum_buffer(self):
        tx = make_optimizer(TrainConfig(fused_sgd=True,
                                        momentum_dtype="bfloat16"),
                            ModelConfig())
        params, _ = self._trees()
        state = tx.init(params)
        assert state.momentum.dtype == jnp.bfloat16

    def test_norm_weight_decay_rejected(self):
        import pytest
        with pytest.raises(ValueError, match="fused_sgd"):
            make_optimizer(TrainConfig(fused_sgd=True,
                                       norm_weight_decay=0.0),
                           ModelConfig())

    def test_works_under_jit_with_donation(self):
        import jax
        from podtpu.train.optim import apply_optimizer
        tx = make_optimizer(TrainConfig(fused_sgd=True), ModelConfig())
        params, grads = self._trees()
        state = tx.init(params)

        @jax.jit
        def step(params, state, grads, lr):
            return apply_optimizer(tx, grads, state, params, lr)

        p1, s1 = step(params, state, grads, jnp.float32(0.01))
        p2, s2 = step(p1, s1, grads, jnp.float32(0.01))
        assert np.isfinite(np.asarray(p2["box_head"]["w"])).all()
