"""End-to-end training test: synthetic project -> train() -> artifacts."""
import os

from podtpu.train.checkpoints import load_model, read_labels


class TestTrainE2E:
    def test_output_directory(self, trained_model):
        assert os.path.isdir(trained_model)
        assert trained_model.endswith("e2e")

    def test_labels_txt_format(self, trained_model):
        path = os.path.join(trained_model, "labels.txt")
        with open(path) as fp:
            content = fp.read()
        assert content == "1,particle\n"
        assert read_labels(path) == ["particle"]

    def test_results_txt_12_stats(self, trained_model):
        with open(os.path.join(trained_model, "results.txt")) as fp:
            lines = fp.read().strip().splitlines()
        assert len(lines) == 12
        assert lines[0].startswith("Average Precision")
        assert lines[6].startswith("Average Recall")
        for line in lines:
            val = float(line.split("=")[-1])
            assert -1.0 <= val <= 1.0

    def test_model_roundtrip(self, trained_model):
        params, frozen, cfg, labels = load_model(trained_model)
        assert labels == ["particle"]
        assert cfg.num_classes == 2
        assert cfg.image_size == (128, 128)
        assert "backbone" in params

    def test_resume_checkpoint_written(self, trained_model):
        assert os.path.exists(os.path.join(trained_model, "checkpoint.pkl"))
