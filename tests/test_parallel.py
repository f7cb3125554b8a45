"""Data-parallel shard_map tests on the 8-device virtual CPU mesh."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.models.detector import FasterRCNN
from podtpu.parallel.dp import make_dp_eval_step, make_dp_train_step, make_mesh
from podtpu.train.optim import make_optimizer
from podtpu.train.step import create_train_state, make_train_step


def micro_cfg():
    model = ModelConfig(
        num_classes=2,
        image_size=(64, 64),
        rpn_pre_nms_topk_train=32,
        rpn_pre_nms_topk_test=32,
        rpn_post_nms_topk_train=32,
        rpn_post_nms_topk_test=16,
        box_batch_per_image=8,
        detections_per_image=4,
        max_gt_boxes=4,
        compute_dtype="float32",
    )
    return Config(model=model,
                  train=TrainConfig(),
                  data=DataConfig(photometric_distort=False))


def make_batch(batch=8, size=64, g=4, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, size // 2, (batch, g, 2)).astype(np.float32)
    wh = rng.uniform(8, size // 2 - 4, (batch, g, 2)).astype(np.float32)
    return {
        "image": rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32),
        "boxes": np.concatenate([xy, xy + wh], -1),
        "labels": np.ones((batch, g), np.int32),
        "valid": np.ones((batch, g), bool),
        "scale": np.ones((batch,), np.float32),
        "original_size": np.full((batch, 2), size, np.int32),
        "index": np.arange(batch, dtype=np.int32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = micro_cfg()
    model = FasterRCNN(cfg=cfg.model)
    images = jnp.zeros((1, 64, 64, 3), jnp.float32)
    init_vars = model.init(jax.random.key(0), images, train=False)
    tx = make_optimizer(cfg.train, cfg.model)

    def fresh_variables():
        # Train steps donate their state; hand each test its own buffers.
        return jax.tree.map(jnp.array, init_vars)

    return cfg, model, fresh_variables, tx


class TestDataParallel:
    def test_mesh_has_8_devices(self):
        mesh = make_mesh()
        assert mesh.devices.size == 8

    def test_dp_train_step_runs(self, setup):
        cfg, model, fresh_variables, tx = setup
        variables = fresh_variables()
        orig_box_head = jax.tree.map(np.asarray,
                                     variables["params"]["box_head"])
        mesh = make_mesh()
        step_fn, shard_batch = make_dp_train_step(model, tx, cfg, mesh)
        state = create_train_state(variables, tx)
        batch = shard_batch(make_batch(batch=8))
        state2, metrics = step_fn(state, batch, jax.random.key(1),
                                  jnp.float32(0.01))
        assert np.isfinite(float(metrics["loss"]))
        # Params actually changed.
        delta = jax.tree.map(lambda a, b: float(jnp.abs(np.asarray(a) - b).max()),
                             state2.params["box_head"], orig_box_head)
        assert max(jax.tree.leaves(delta)) > 0

    def test_dp_matches_single_device_gradient(self, setup):
        """DP over 8 shards == single-device step on the same global batch
        (same rng per sample is impossible across layouts, so compare with
        augmentation disabled and deterministic sampling off hack: we check
        the loss at identical params rather than exact grads)."""
        cfg, model, fresh_variables, tx = setup
        mesh = make_mesh()
        step_fn, shard_batch = make_dp_train_step(model, tx, cfg, mesh)
        state = create_train_state(fresh_variables(), tx)
        batch_np = make_batch(batch=8)
        _, dp_metrics = step_fn(state, shard_batch(batch_np),
                                jax.random.key(1), jnp.float32(0.0))
        assert np.isfinite(float(dp_metrics["loss"]))
        # lr=0 -> params unchanged even though step ran.
        state_single = create_train_state(fresh_variables(), tx)
        single_step = make_train_step(model, tx, cfg)
        _, single_metrics = single_step(state_single, batch_np,
                                        jax.random.key(1), jnp.float32(0.0))
        # Same order of magnitude (sampling rngs differ; loss must be close).
        assert abs(float(dp_metrics["loss"])
                   - float(single_metrics["loss"])) < 1.0

    def test_dp_eval_step(self, setup):
        cfg, model, fresh_variables, tx = setup
        variables = fresh_variables()
        mesh = make_mesh()
        eval_fn = make_dp_eval_step(model, mesh)
        batch = make_batch(batch=8)
        det = eval_fn(variables["params"], variables["frozen"],
                      batch["image"])
        assert det.boxes.shape == (8, 4, 4)
        assert np.isfinite(np.asarray(det.boxes)).all()
