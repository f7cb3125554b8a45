"""Product-path data parallelism + loss-masking tests (VERDICT #2, #9).

`train(..., num_devices=N)` must run the shard_map DP step from the product
driver (the reference's multi-GPU recipe, `engine/train.py:165-296`), and
wrap-around duplicate images (loader ``batch_valid``) must contribute zero
gradient (the reference never pads batches; our static-shape loader does).
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import tiny_config


class TestTrainDP:
    def test_train_runs_on_2_device_mesh(self, synthetic_root, tmp_path):
        from podtpu.train.train import train
        from tests.synthetic import make_project

        project = make_project(str(synthetic_root / "images"), num_images=10)
        out = train(
            project, labels=["particle"], output_dir=str(tmp_path),
            name="dp2", batch_size=2, max_epochs=1, alrs_epochs=2,
            alrs_startup_factor=1, config=tiny_config(), num_workers=2,
            seed=0, num_devices=2,
        )
        assert os.path.exists(os.path.join(out, "model.msgpack"))
        assert os.path.exists(os.path.join(out, "labels.txt"))
        assert os.path.exists(os.path.join(out, "results.txt"))

    def test_train_dp_streaming_loader(self, synthetic_root, tmp_path):
        """DP with the device cache forced OFF: the streaming Loader path
        must explicitly shard each host batch over the mesh
        (``dp_shard_batch`` in train.py) rather than relying on
        compiler-chosen input shardings."""
        import dataclasses

        from podtpu.train.train import train
        from tests.synthetic import make_project

        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, device_data_cache=False))
        project = make_project(str(synthetic_root / "images"), num_images=10)
        out = train(
            project, labels=["particle"], output_dir=str(tmp_path),
            name="dp2s", batch_size=2, max_epochs=1, alrs_epochs=2,
            alrs_startup_factor=1, config=cfg, num_workers=2,
            seed=0, num_devices=2,
        )
        assert os.path.exists(os.path.join(out, "model.msgpack"))
        assert os.path.exists(os.path.join(out, "results.txt"))


class TestBatchValidMasking:
    def test_duplicate_images_contribute_no_gradient(self):
        """Two batches differing ONLY in a weight-0 image produce identical
        losses and identical updated params."""
        from podtpu.models.detector import FasterRCNN
        from podtpu.train.optim import make_optimizer
        from podtpu.train.step import create_train_state, make_train_step
        from tests.test_parallel import make_batch, micro_cfg

        cfg = micro_cfg()
        model = FasterRCNN(cfg=cfg.model)
        init_vars = model.init(jax.random.key(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        tx = make_optimizer(cfg.train, cfg.model)
        step = make_train_step(model, tx, cfg)

        def run(batch_np):
            variables = jax.tree.map(jnp.array, init_vars)
            state = create_train_state(variables, tx)
            state2, metrics = step(state, batch_np, jax.random.key(7),
                                   jnp.float32(0.02))
            return (jax.tree.map(np.asarray, state2.params),
                    float(metrics["loss"]))

        base = make_batch(batch=2, seed=0)
        base["image_weight"] = np.array([1.0, 0.0], np.float32)

        tampered = {k: np.array(v) for k, v in base.items()}
        other = make_batch(batch=2, seed=99)
        tampered["image"][1] = other["image"][1]
        tampered["boxes"][1] = other["boxes"][1]

        params_a, loss_a = run(base)
        params_b, loss_b = run(tampered)
        assert loss_a == pytest.approx(loss_b, rel=1e-6)
        diffs = jax.tree.map(
            lambda a, b: float(np.abs(a - b).max()), params_a, params_b)
        assert max(jax.tree.leaves(diffs)) < 1e-6

    def test_weighted_loss_differs_from_unweighted(self):
        """Sanity: the weight actually changes the loss when the masked
        image would otherwise contribute."""
        from podtpu.models.detector import FasterRCNN
        from podtpu.train.optim import make_optimizer
        from podtpu.train.step import create_train_state, make_train_step
        from tests.test_parallel import make_batch, micro_cfg

        cfg = micro_cfg()
        model = FasterRCNN(cfg=cfg.model)
        init_vars = model.init(jax.random.key(0),
                               jnp.zeros((1, 64, 64, 3)), train=False)
        tx = make_optimizer(cfg.train, cfg.model)
        step = make_train_step(model, tx, cfg)

        losses = {}
        for name, w in [("masked", np.array([1.0, 0.0], np.float32)),
                        ("full", np.array([1.0, 1.0], np.float32))]:
            batch = make_batch(batch=2, seed=3)
            batch["image_weight"] = w
            variables = jax.tree.map(jnp.array, init_vars)
            state = create_train_state(variables, tx)
            _, metrics = step(state, batch, jax.random.key(7),
                              jnp.float32(0.0))
            losses[name] = float(metrics["loss"])
        assert losses["masked"] != pytest.approx(losses["full"], rel=1e-4)
