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


class TestHeldOutTasks:
    def test_train_with_test_project(self, tmp_path, capsys):
        """test_project: all of the main project trains; evaluation runs on
        the held-out project (the reference's own TODO, miso/cli.py:118)."""
        from podtpu.train.train import train
        from tests.conftest import tiny_config
        from tests.synthetic import make_project

        train_p = make_project(str(tmp_path / "train_imgs"), num_images=4)
        held_p = make_project(str(tmp_path / "test_imgs"), num_images=3,
                              seed=9)
        out = train(train_p, labels=["particle"],
                    output_dir=str(tmp_path / "models"), name="held",
                    batch_size=2, max_epochs=1, alrs_epochs=2,
                    alrs_startup_factor=1, config=tiny_config(),
                    num_workers=2, test_project=held_p)
        assert os.path.exists(os.path.join(out, "results.txt"))
        text = capsys.readouterr().out
        assert "- train: 4" in text
        assert "- test:  3 (held-out tasks)" in text

    def test_empty_test_project_raises(self, tmp_path):
        import pytest

        from podtpu.data.project import Project
        from podtpu.train.train import train
        from tests.conftest import tiny_config
        from tests.synthetic import make_project

        train_p = make_project(str(tmp_path / "imgs"), num_images=4)
        with pytest.raises(ValueError, match="test_project"):
            train(train_p, labels=["particle"],
                  output_dir=str(tmp_path / "models"), name="x",
                  batch_size=2, max_epochs=1, config=tiny_config(),
                  test_project=Project())


class TestPerClassArtifact:
    def test_multilabel_train_writes_per_class_results(self, tmp_path):
        from tests.conftest import tiny_config
        from podtpu.train.train import train
        from tests.synthetic import make_project

        # 10 images -> a 2-image held-out split (4 would round to zero
        # test images and leave the evaluator without any ground truth).
        project = make_project(str(tmp_path / "imgs"), num_images=10,
                               max_boxes=4, labels=["alpha", "beta"], seed=5)
        out = train(project, labels=["alpha", "beta"],
                    output_dir=str(tmp_path / "models"), name="pc",
                    batch_size=2, max_epochs=1, alrs_epochs=1,
                    alrs_startup_factor=1, config=tiny_config(),
                    num_workers=2, seed=0)
        path = os.path.join(out, "results_per_class.txt")
        assert os.path.exists(path)
        text = open(path).read()
        assert text.splitlines()[0].split()[0] == "class"
        # Both foreground classes appear (the 4-image set has gt for each).
        assert "alpha" in text and "beta" in text
