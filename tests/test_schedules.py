"""Fixed LR schedules (multistep/cosine) + AdamW / norm-weight-decay split.

Vendored-trainer parity: torch MultiStepLR / CosineAnnealingLR over a fixed
epoch budget (`miso/object_detection/engine/train.py:254-262`) and the
``--opt adamw`` / ``--norm-weight-decay`` options (:231-250).
"""
import dataclasses
import math
import os

import numpy as np
import pytest

from podtpu.core.config import ModelConfig, TrainConfig
from podtpu.train.schedules import (CosineScheduler, MultiStepScheduler,
                                    make_scheduler)


class TestMultiStep:
    def test_lr_values_match_torch_multistep(self):
        s = MultiStepScheduler(0.02, epochs=26, steps=(16, 22), gamma=0.1)
        assert s.lr_for(0) == pytest.approx(0.02)
        assert s.lr_for(15) == pytest.approx(0.02)
        assert s.lr_for(16) == pytest.approx(0.002)
        assert s.lr_for(21) == pytest.approx(0.002)
        assert s.lr_for(22) == pytest.approx(0.0002)
        assert s.lr_for(25) == pytest.approx(0.0002)

    def test_stops_after_budget(self):
        s = MultiStepScheduler(0.02, epochs=3)
        assert s.step(0, 1.0) is False
        assert s.step(1, 1.0) is False
        assert s.step(2, 1.0) is True

    def test_unsorted_steps_are_sorted(self):
        s = MultiStepScheduler(1.0, epochs=30, steps=(22, 16), gamma=0.5)
        assert s.lr_for(18) == pytest.approx(0.5)


class TestCosine:
    def test_lr_follows_cosine(self):
        s = CosineScheduler(1.0, epochs=10)
        assert s.lr_for(0) == pytest.approx(1.0)
        assert s.lr_for(5) == pytest.approx(0.5)
        for e in range(10):
            expected = 0.5 * (1 + math.cos(math.pi * e / 10))
            assert s.lr_for(e) == pytest.approx(expected)

    def test_stops_after_budget(self):
        s = CosineScheduler(1.0, epochs=2)
        assert s.step(0, 1.0) is False
        assert s.step(1, 1.0) is True

    def test_state_roundtrip_is_pure(self):
        s = CosineScheduler(1.0, epochs=4)
        state = s.state_dict()
        s.load_state_dict(state)  # no-op: pure function of the epoch
        assert s.lr_for(2) == pytest.approx(0.5)


class TestFactory:
    def test_alrs_default(self):
        from podtpu.train.alrs import AdaptiveLearningRateScheduler
        sched = make_scheduler(TrainConfig(), 0.005)
        assert isinstance(sched, AdaptiveLearningRateScheduler)
        # The ALRS adapter ignores the epoch index.
        assert sched.lr_for(7) == sched.lr

    def test_multistep_and_cosine(self):
        cfg = TrainConfig(lr_schedule="multistep", epochs=26,
                          lr_steps=(16, 22), lr_gamma=0.1)
        assert isinstance(make_scheduler(cfg, 0.02), MultiStepScheduler)
        cfg = TrainConfig(lr_schedule="cosine", epochs=26)
        assert isinstance(make_scheduler(cfg, 0.02), CosineScheduler)

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="lr_schedule"):
            make_scheduler(TrainConfig(lr_schedule="step"), 0.02)


class TestAdamWAndNormSplit:
    def _grad_step(self, train_cfg, params, grads):
        import jax

        from podtpu.train.optim import make_optimizer

        tx = make_optimizer(train_cfg, ModelConfig(
            trainable_backbone_stages=5))
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        return jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    def test_adamw_decoupled_decay(self):
        # With zero gradient, AdamW still shrinks the weight by lr*wd
        # (decoupled decay); plain adam leaves it untouched.
        params = {"head": {"kernel": np.full((2,), 1.0, np.float32)}}
        grads = {"head": {"kernel": np.zeros((2,), np.float32)}}
        out = self._grad_step(
            TrainConfig(optimiser="adamw", adam_lr=0.1, weight_decay=0.5),
            params, grads)
        np.testing.assert_allclose(out["head"]["kernel"], 0.95, rtol=1e-6)
        out = self._grad_step(
            TrainConfig(optimiser="adam", adam_lr=0.1, weight_decay=0.5),
            params, grads)
        np.testing.assert_allclose(out["head"]["kernel"], 1.0, rtol=1e-6)

    def test_norm_weight_decay_split(self):
        # GroupNorm-looking params ('gn' module names) decay at
        # norm_weight_decay; everything else at weight_decay.  SGD with
        # zero momentum and zero grads isolates the decay term.
        params = {"head": {"kernel": np.full((2,), 1.0, np.float32),
                           "cls_gn0": {"scale": np.full((2,), 1.0,
                                                        np.float32)}},
                  "vgg": {"l2norm_scale": np.full((2,), 1.0, np.float32)}}
        grads = {"head": {"kernel": np.zeros((2,), np.float32),
                          "cls_gn0": {"scale": np.zeros((2,), np.float32)}},
                 "vgg": {"l2norm_scale": np.zeros((2,), np.float32)}}
        out = self._grad_step(
            TrainConfig(optimiser="sgd", lr=1.0, momentum=0.0,
                        weight_decay=0.1, norm_weight_decay=0.0),
            params, grads)
        np.testing.assert_allclose(out["head"]["kernel"], 0.9, rtol=1e-6)
        # Norm params: zero decay under the split.
        np.testing.assert_allclose(out["head"]["cls_gn0"]["scale"], 1.0,
                                   rtol=1e-6)
        np.testing.assert_allclose(out["vgg"]["l2norm_scale"], 1.0,
                                   rtol=1e-6)


class TestTrainWithFixedSchedule:
    def test_multistep_runs_exact_budget(self, tmp_path, capsys):
        from podtpu.train.train import train
        from tests.conftest import tiny_config
        from tests.synthetic import make_project

        project = make_project(str(tmp_path / "imgs"), num_images=4)
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, lr_schedule="multistep", epochs=2,
                lr_steps=(1,), lr_gamma=0.1))
        out = train(project, labels=["particle"],
                    output_dir=str(tmp_path / "models"), name="ms",
                    batch_size=2, max_epochs=50, config=cfg, num_workers=2)
        assert os.path.exists(os.path.join(out, "results.txt"))
        text = capsys.readouterr().out
        # Stopped by the schedule budget, not max_epochs.
        assert "Training finished, 2 epochs" in text


class TestEvaluateModel:
    def test_test_only_eval(self, trained_model, tmp_path, capsys):
        from podtpu.train.train import evaluate_model
        from tests.synthetic import make_project

        held = make_project(str(tmp_path / "eval_imgs"), num_images=3,
                            seed=5, image_size=(128, 128))
        out_dir = str(tmp_path / "eval_out")
        stats = evaluate_model(held, trained_model, batch_size=2,
                               output_dir=out_dir)
        assert len(stats) == 12
        assert all(-1.0 <= s <= 1.0 for s in stats)
        assert os.path.exists(os.path.join(out_dir, "results.txt"))
        text = capsys.readouterr().out
        assert "Evaluating" in text

    def test_no_matching_labels_raises(self, trained_model, tmp_path):
        from podtpu.data.project import Project
        from podtpu.train.train import evaluate_model

        with pytest.raises(ValueError, match="no annotated images"):
            evaluate_model(Project(), trained_model)


class TestScheduleKindValidation:
    """Resume must reject a checkpoint saved under a different
    --lr-schedule (ADVICE r2: an ALRS state under multistep silently lost
    its drop/buffer state; a multistep state under alrs KeyError'd)."""

    def test_alrs_state_rejected_by_multistep(self):
        from podtpu.train.alrs import AdaptiveLearningRateScheduler
        alrs = AdaptiveLearningRateScheduler(0.005, verbose=False)
        alrs.step(0, 1.0)
        ms = MultiStepScheduler(0.02, epochs=26)
        with pytest.raises(ValueError, match="alrs"):
            ms.load_state_dict(alrs.state_dict())

    def test_multistep_state_rejected_by_alrs(self):
        from podtpu.train.alrs import AdaptiveLearningRateScheduler
        ms = MultiStepScheduler(0.02, epochs=26)
        alrs = AdaptiveLearningRateScheduler(0.005, verbose=False)
        with pytest.raises(ValueError, match="multistep"):
            alrs.load_state_dict(ms.state_dict())

    def test_legacy_untagged_alrs_state_still_loads(self):
        from podtpu.train.alrs import AdaptiveLearningRateScheduler
        legacy = {"drop_count": 2, "buffer": [1.0, 0.9], "finished": False}
        alrs = AdaptiveLearningRateScheduler(0.005, verbose=False)
        alrs.load_state_dict(legacy)
        assert alrs.drop_count == 2

    def test_legacy_untagged_alrs_state_rejected_by_cosine(self):
        legacy = {"drop_count": 2, "buffer": [1.0], "finished": False}
        with pytest.raises(ValueError, match="alrs"):
            CosineScheduler(0.02, epochs=26).load_state_dict(legacy)

    def test_same_kind_roundtrip(self):
        ms = MultiStepScheduler(0.02, epochs=26)
        ms.load_state_dict(ms.state_dict())
        cs = CosineScheduler(0.02, epochs=26)
        cs.load_state_dict(cs.state_dict())


class TestExhaustedBudget:
    """A resumed run whose budget is already spent trains zero further
    epochs (torch ``range(start_epoch, epochs)`` semantics)."""

    def test_multistep_exhausted(self):
        ms = MultiStepScheduler(0.02, epochs=3)
        assert not ms.exhausted(2)
        assert ms.exhausted(3)

    def test_cosine_exhausted(self):
        cs = CosineScheduler(0.02, epochs=3)
        assert not cs.exhausted(0)
        assert cs.exhausted(3)

    def test_alrs_exhausted_after_drops(self):
        from podtpu.train.alrs import AdaptiveLearningRateScheduler
        alrs = AdaptiveLearningRateScheduler(0.005, nb_drops=1, nb_epochs=1,
                                             startup_delay_factor=0,
                                             verbose=False)
        assert not alrs.exhausted(0)
        alrs.drop_count = 1
        alrs.finished = True
        assert alrs.exhausted(5)

    def test_resume_completed_run_trains_zero_epochs(self, tmp_path, capsys):
        from podtpu.train.train import train
        from tests.synthetic import make_project

        from tests.conftest import tiny_config
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, lr_schedule="multistep", epochs=2, lr_steps=(1,)))
        proj = make_project(str(tmp_path / "imgs"), num_images=6, seed=0)
        out = train(proj, output_dir=str(tmp_path / "models"), name="done",
                    batch_size=2, max_epochs=50, config=cfg, num_workers=2)
        capsys.readouterr()
        # Resume the finished run: must evaluate but not train.
        train(proj, output_dir=str(tmp_path / "models"), name="done",
              batch_size=2, max_epochs=50, config=cfg, num_workers=2,
              resume=True)
        text = capsys.readouterr().out
        assert "budget already spent" in text
        assert "Epoch: [2]" not in text
        assert os.path.exists(os.path.join(out, "results.txt"))
