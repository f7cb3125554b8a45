"""Trainable-BatchNorm mode of FrozenBatchNorm (round 5) vs
torch.nn.BatchNorm2d — the from-scratch norm torchvision's detection
constructors select (``norm_layer = FrozenBatchNorm2d if is_trained else
nn.BatchNorm2d``)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.models.resnet import FrozenBatchNorm


def _torch_bn(C):
    import torch
    return torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)


class TestTrainableBatchNorm:
    C = 6

    def _make(self):
        bn = FrozenBatchNorm(self.C, dtype=jnp.float32, trainable=True)
        x0 = jnp.zeros((2, 4, 4, self.C))
        variables = bn.init(jax.random.key(0), x0)
        return bn, variables

    def test_train_forward_matches_torch(self):
        import torch
        bn, variables = self._make()
        rng = np.random.default_rng(0)
        x = rng.normal(1.5, 2.0, (3, 5, 4, self.C)).astype(np.float32)

        y, muts = bn.apply({"params": variables["params"],
                            "frozen": variables["frozen"]},
                           jnp.asarray(x), mutable=["frozen"])

        tbn = _torch_bn(self.C).train()
        ty = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y), ty.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5)
        # Running stats after one step match torch's (unbiased var, 0.1
        # momentum).
        np.testing.assert_allclose(np.asarray(muts["frozen"]["mean"]),
                                   tbn.running_mean.numpy(), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(muts["frozen"]["var"]),
                                   tbn.running_var.numpy(), rtol=1e-5,
                                   atol=1e-6)

    def test_eval_uses_running_stats_matches_torch(self):
        import torch
        bn, variables = self._make()
        tbn = _torch_bn(self.C).train()
        rng = np.random.default_rng(1)
        frozen = variables["frozen"]
        for i in range(3):
            x = rng.normal(i, 1.0 + i, (2, 3, 3, self.C)).astype(np.float32)
            _, muts = bn.apply({"params": variables["params"],
                                "frozen": frozen},
                               jnp.asarray(x), mutable=["frozen"])
            frozen = muts["frozen"]
            tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))

        xe = rng.normal(0, 1, (2, 3, 3, self.C)).astype(np.float32)
        ye = bn.apply({"params": variables["params"], "frozen": frozen},
                      jnp.asarray(xe))  # no mutable -> eval semantics
        te = _torch_bn(self.C).eval()
        te.load_state_dict(tbn.state_dict())
        ty = te(torch.from_numpy(xe.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(ye), ty.detach().numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5)

    def test_affine_params_are_trainable_params(self):
        _, variables = self._make()
        assert set(variables["params"]) == {"weight", "bias"}
        assert set(variables["frozen"]) == {"mean", "var"}

    def test_gradient_flows_through_affine(self):
        bn, variables = self._make()
        x = jnp.asarray(np.random.default_rng(2).normal(
            0, 1, (2, 3, 3, self.C)).astype(np.float32))

        def loss(params):
            y, _ = bn.apply({"params": params,
                             "frozen": variables["frozen"]}, x,
                            mutable=["frozen"])
            return jnp.sum(y ** 2)

        g = jax.grad(loss)(variables["params"])
        assert float(jnp.abs(g["weight"]).sum()) > 0
        assert float(jnp.abs(g["bias"]).sum()) > 0

    def test_frozen_mode_unchanged(self):
        bn = FrozenBatchNorm(self.C, dtype=jnp.float32)
        x0 = jnp.zeros((1, 2, 2, self.C))
        variables = bn.init(jax.random.key(0), x0)
        assert "params" not in variables
        assert set(variables["frozen"]) == {"weight", "bias", "mean", "var"}


class TestFromScratchBatchNormTraining:
    """train() auto-selects trainable BN for from-scratch mobile trunks
    (torchvision's is_trained norm rule) and the running stats actually
    move during training."""

    @pytest.mark.slow
    def test_mnv2_from_scratch_uses_batch_norm(self, tmp_path, capsys):
        from tests.conftest import tiny_config
        from tests.synthetic import make_project
        from podtpu.train.checkpoints import load_model, load_train_checkpoint
        from podtpu.train.train import train

        project = make_project(str(tmp_path / "imgs"), num_images=6,
                               image_size=(128, 128))
        out = train(project, labels=["particle"],
                    output_dir=str(tmp_path / "m"), name="bnscratch",
                    batch_size=2, max_epochs=1, alrs_epochs=2,
                    alrs_startup_factor=1, config=tiny_config(),
                    num_workers=2, seed=0, num_devices=1,
                    backbone="mobilenet_v2")
        text = capsys.readouterr().out
        assert "trainable BatchNorm" in text
        params, frozen, model_cfg, labels = load_model(out)
        assert model_cfg.backbone_norm == "batch"
        # BN affine now lives in params; running stats moved off identity.
        bn = params["backbone"]["bn_stem"]
        assert set(bn) == {"weight", "bias"}
        stem_stats = frozen["backbone"]["bn_stem"]
        assert set(stem_stats) == {"mean", "var"}
        assert float(np.abs(np.asarray(stem_stats["mean"])).sum()) > 0
        # The saved config rebuilds the same architecture for inference.
        from podtpu.models.detector import make_detector
        from podtpu.train.step import make_eval_step
        model = make_detector(model_cfg)
        det = make_eval_step(model)(
            params, frozen,
            jnp.zeros((1,) + tuple(model_cfg.image_size) + (3,)))
        assert np.asarray(det.scores).shape[0] == 1


class TestSSDLiteBatchNormMode:
    def test_ssdlite_builds_and_steps_in_batch_mode(self):
        """The SSDLite trunk threads backbone_norm (ssd.py) — one train
        step in batch mode produces finite losses and updated stats."""
        import dataclasses

        import jax
        from podtpu.core.config import (Config, DataConfig, TrainConfig,
                                        ssdlite_config)
        from podtpu.models.detector import make_detector, init_variables
        from podtpu.train.optim import make_optimizer
        from podtpu.train.step import create_train_state, make_train_step

        model_cfg = ssdlite_config(image_size=(96, 96))
        model_cfg = dataclasses.replace(
            model_cfg, num_classes=2, max_gt_boxes=4,
            detections_per_image=4, compute_dtype="float32",
            backbone_norm="batch")
        cfg = Config(model=model_cfg, train=TrainConfig(),
                     data=DataConfig(photometric_distort=False))
        model = make_detector(model_cfg)
        variables = init_variables(model, jax.random.key(0))
        assert "weight" in variables["params"]["backbone"]["bn_stem"]
        assert set(variables["frozen"]["backbone"]["bn_stem"]) == {
            "mean", "var"}
        tx = make_optimizer(cfg.train, cfg.model)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, cfg)
        from tests.test_parallel import make_batch
        batch = make_batch(batch=2, size=96, g=4)
        batch["image_weight"] = np.ones((2,), np.float32)
        state, metrics = step(state, batch, jax.random.key(1),
                              jnp.float32(0.01))
        assert np.isfinite(float(metrics["loss"]))
        stem = state.frozen["backbone"]["bn_stem"]
        assert float(np.abs(np.asarray(stem["mean"])).sum()) > 0
