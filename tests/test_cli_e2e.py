"""End-to-end CLI tests: train + infer against the in-process fake CVAT
server — the reference's primary user journey (SURVEY.md §3.1/§3.2)."""
import json
import os

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from podtpu.cli import cli
from tests.fake_cvat import FakeCvatServer, FakeCvatState
from tests.synthetic import draw_particle


@pytest.fixture(scope="module")
def cvat_env(tmp_path_factory):
    """Fake CVAT server with one annotated task + one unlabelled task,
    images on disk in the layout the client resolves."""
    root = tmp_path_factory.mktemp("cvat")
    raw = root / "7" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    frames, shapes = [], []
    sid = 1
    for i in range(8):
        img = rng.integers(10, 40, (160, 160, 3)).astype(np.uint8)
        # 1-2 particles per frame.
        for _ in range(int(rng.integers(1, 3))):
            bw, bh = int(rng.integers(28, 56)), int(rng.integers(28, 56))
            x = int(rng.integers(0, 160 - bw))
            y = int(rng.integers(0, 160 - bh))
            draw_particle(img, x, y, bw, bh, (235, 235, 245))
            shapes.append({
                "id": sid, "type": "rectangle", "frame": i, "label_id": 10,
                "points": [x, y, x + bw, y + bh], "outside": False})
            sid += 1
        name = f"frame_{i:02d}.jpg"
        Image.fromarray(img).save(raw / name, quality=92)
        frames.append(name)

    labels = [{"id": 10, "name": "particle", "color": "#ff0000"}]
    state = FakeCvatState()
    state.add_task(5, "annotated_task", labels, frames, shapes=shapes)
    # Task 6: same frames, no annotations (inference target).
    state.add_task(6, "unlabelled_task", labels, frames)
    server = FakeCvatServer(state)
    server.__enter__()
    yield server, state, str(root)
    server.__exit__(None, None, None)


@pytest.fixture(scope="module")
def trained_via_cli(cvat_env, tmp_path_factory):
    server, state, root = cvat_env
    out = tmp_path_factory.mktemp("models")
    runner = CliRunner()
    result = runner.invoke(cli, [
        "train-object-detector",
        "--tasks", "5",
        "--server", server.url,
        "--image-root", root,
        "--image-size", "128",
        "--batch-size", "2",
        "--max-epochs", "1",
        "--alrs-epochs", "2",
        "-o", str(out),
        "-m", "cli_model",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    return str(out)


def test_keypoint_roi_expand_flag_reaches_config(cvat_env, tmp_path,
                                                 monkeypatch):
    """--keypoint-roi-expand is product surface, not tool lore: the value
    must land in ModelConfig.keypoint_roi_expand (used identically by the
    keypoint head's train-target discretisation and decode,
    models/detector.py)."""
    import podtpu.train.train as train_mod

    server, state, root = cvat_env
    seen = {}

    def fake_train(project, labels, **kwargs):
        seen["cfg"] = kwargs["config"]
        return str(tmp_path)

    monkeypatch.setattr(train_mod, "train", fake_train)
    runner = CliRunner()
    result = runner.invoke(cli, [
        "train-object-detector",
        "--tasks", "5",
        "--server", server.url,
        "--image-root", root,
        "--image-size", "128",
        "--with-keypoints", "--num-keypoints", "4",
        "--keypoint-roi-expand", "1.3",
        "-o", str(tmp_path), "-m", "kp_model",
    ], catch_exceptions=False)
    assert result.exit_code == 0, result.output
    assert seen["cfg"].model.keypoint_roi_expand == pytest.approx(1.3)


class TestCliTrain:
    def test_artifacts(self, trained_via_cli):
        model_dir = os.path.join(trained_via_cli, "cli_model")
        for f in ("model.msgpack", "config.json", "labels.txt",
                  "results.txt"):
            assert os.path.exists(os.path.join(model_dir, f)), f
        with open(os.path.join(model_dir, "labels.txt")) as fp:
            assert fp.read() == "1,particle\n"

    def test_infer_uploads_shapes(self, cvat_env, trained_via_cli):
        server, state, root = cvat_env
        n_patches_before = len(state.patches)
        runner = CliRunner()
        result = runner.invoke(cli, [
            "infer-object-detector",
            "--tasks", "6",
            "--server", server.url,
            "--image-root", root,
            "--model-dir", trained_via_cli,
            "--model", "cli_model",
            "--threshold", "0.05",
            "--batch-size", "2",
        ], catch_exceptions=False)
        assert result.exit_code == 0, result.output
        ann_patches = [p for p in state.patches[n_patches_before:]
                       if "annotations" in p["path"]]
        assert ann_patches, "no annotation upload PATCH"
        body = ann_patches[-1]["body"]
        assert body["version"] == 0
        for shape in body["shapes"]:
            assert shape["type"] == "rectangle"
            assert shape["label_id"] == 10
            assert len(shape["points"]) == 4

    def test_crop_objects_cli(self, cvat_env, tmp_path):
        server, state, root = cvat_env
        runner = CliRunner()
        result = runner.invoke(cli, [
            "crop-objects",
            "--tasks", "5",
            "--server", server.url,
            "--image-root", root,
            "-o", str(tmp_path / "crops"),
        ], catch_exceptions=False)
        assert result.exit_code == 0, result.output
        crop_files = list((tmp_path / "crops").rglob("*.jpg"))
        assert crop_files
        # class-sorted layout: .../<task id> - <name>/<label>/<crop>
        assert any("5 - annotated_task" in str(p) and "particle" in str(p)
                   for p in crop_files)
