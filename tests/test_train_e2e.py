"""End-to-end training test: synthetic project -> train() -> artifacts."""
import dataclasses
import os

import numpy as np
import pytest

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.train.checkpoints import load_model, read_labels
from tests.synthetic import make_project


def tiny_config():
    model = ModelConfig(
        image_size=(128, 128),
        rpn_pre_nms_topk_train=128,
        rpn_pre_nms_topk_test=128,
        rpn_post_nms_topk_train=128,
        rpn_post_nms_topk_test=64,
        box_batch_per_image=32,
        detections_per_image=16,
        max_gt_boxes=8,
        compute_dtype="float32",
    )
    train = TrainConfig(warmup_iters=10, log_every=1)
    data = DataConfig(num_workers=2, photometric_distort=False)
    return Config(model=model, train=train, data=data)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from podtpu.train.train import train

    root = tmp_path_factory.mktemp("synthetic")
    project = make_project(str(root / "images"), num_images=10)
    out = train(
        project,
        labels=["particle"],
        output_dir=str(root / "models"),
        name="e2e",
        batch_size=2,
        max_epochs=2,
        alrs_epochs=2,
        alrs_startup_factor=1,
        config=tiny_config(),
        num_workers=2,
        seed=0,
    )
    return out


class TestTrainE2E:
    def test_output_directory(self, trained):
        assert os.path.isdir(trained)
        assert trained.endswith("e2e")

    def test_labels_txt_format(self, trained):
        path = os.path.join(trained, "labels.txt")
        with open(path) as fp:
            content = fp.read()
        assert content == "1,particle\n"
        assert read_labels(path) == ["particle"]

    def test_results_txt_12_stats(self, trained):
        with open(os.path.join(trained, "results.txt")) as fp:
            lines = fp.read().strip().splitlines()
        assert len(lines) == 12
        assert lines[0].startswith("Average Precision")
        assert lines[6].startswith("Average Recall")
        for line in lines:
            val = float(line.split("=")[-1])
            assert -1.0 <= val <= 1.0

    def test_model_roundtrip(self, trained):
        params, frozen, cfg, labels = load_model(trained)
        assert labels == ["particle"]
        assert cfg.num_classes == 2
        assert cfg.image_size == (128, 128)
        assert "backbone" in params

    def test_resume_checkpoint_written(self, trained):
        assert os.path.exists(os.path.join(trained, "checkpoint.pkl"))
