"""Mid-training checkpoint/resume tests (SURVEY.md §5: the reference has no
resume; the vendored trainer's pattern is first-class here)."""
import os

import numpy as np
import pytest

from tests.conftest import tiny_config
from tests.synthetic import make_project


class TestResume:
    def test_resume_continues_from_checkpoint(self, tmp_path):
        from podtpu.train.train import train
        from podtpu.train.checkpoints import load_train_checkpoint

        project = make_project(str(tmp_path / "imgs"), num_images=6)
        kwargs = dict(
            labels=["particle"],
            output_dir=str(tmp_path / "models"),
            name="resumable",
            batch_size=2,
            alrs_epochs=2,
            alrs_startup_factor=1,
            config=tiny_config(),
            num_workers=2,
            seed=0,
        )
        out = train(project, max_epochs=1, **kwargs)
        ckpt1 = load_train_checkpoint(out)
        assert ckpt1 is not None and ckpt1["epoch"] == 0
        step_after_first = ckpt1["step"]
        assert step_after_first > 0

        # Resume: runs epoch 1 only (epoch 0 restored).
        out2 = train(project, max_epochs=2, resume=True, **kwargs)
        assert out2 == out
        ckpt2 = load_train_checkpoint(out)
        assert ckpt2["epoch"] == 1
        assert ckpt2["step"] > step_after_first
        # ALRS state carried across (buffer has both epoch losses).
        assert len(ckpt2["alrs"]["buffer"]) == 2

    def test_resume_without_checkpoint_starts_fresh(self, tmp_path):
        from podtpu.train.train import train

        project = make_project(str(tmp_path / "imgs"), num_images=6)
        out = train(project, labels=["particle"],
                    output_dir=str(tmp_path / "m"), name="fresh",
                    batch_size=2, max_epochs=1, alrs_epochs=2,
                    alrs_startup_factor=1, config=tiny_config(),
                    num_workers=2, resume=True)
        assert os.path.exists(os.path.join(out, "results.txt"))

    def test_resume_matches_checkpoint_optimizer_flavor(self, tmp_path):
        """A run checkpointed with the fused flat-buffer SGD resumes
        correctly even when the resuming call's config says otherwise
        (the state layouts are incompatible; train() matches the
        checkpoint's flavor — round-5 fused_sgd lever)."""
        import dataclasses

        from podtpu.train.train import train
        from podtpu.train.checkpoints import load_train_checkpoint

        project = make_project(str(tmp_path / "imgs"), num_images=6)
        cfg = tiny_config()
        fused_cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, fused_sgd=True))
        kwargs = dict(
            labels=["particle"], output_dir=str(tmp_path / "models"),
            name="fusedresume", batch_size=2, alrs_epochs=2,
            alrs_startup_factor=1, num_workers=2, seed=0,
        )
        out = train(project, max_epochs=1, config=fused_cfg, **kwargs)
        from podtpu.train.optim import FusedSGDState
        assert isinstance(load_train_checkpoint(out)["opt_state"],
                          FusedSGDState)

        # Resume WITHOUT fused_sgd in the config: must keep the fused
        # state rather than crash on layout mismatch.
        out2 = train(project, max_epochs=2, resume=True, config=cfg,
                     **kwargs)
        assert out2 == out
        ckpt = load_train_checkpoint(out)
        assert ckpt["epoch"] == 1
        assert isinstance(ckpt["opt_state"], FusedSGDState)
