"""AOT export (podtpu/infer/export.py): serialize the eval forward,
reload it WITHOUT the model code path, and match the live model's output."""
import json
import os

import numpy as np
import pytest

from podtpu.infer.export import EXPORT_NAME, META_NAME, ExportedModel, export_model


@pytest.fixture(scope="module")
def exported(trained_model):
    path = export_model(trained_model, batch_size=2, platforms=("cpu",))
    return trained_model, path


class TestExport:
    def test_artifact_and_meta_written(self, exported):
        model_dir, path = exported
        assert os.path.basename(path) == EXPORT_NAME
        assert os.path.getsize(path) > 1_000_000  # weights are embedded
        meta = json.load(open(os.path.join(model_dir, META_NAME)))
        assert meta["labels"] == ["particle"]
        assert meta["batch_size"] == 2
        assert set(meta["outputs"]) == {"boxes", "scores", "labels", "valid"}

    def test_roundtrip_matches_live_model(self, exported):
        model_dir, path = exported
        from podtpu.infer.inference import load_inference_model

        eval_step, params, frozen, cfg, _ = load_inference_model(model_dir)
        h, w = cfg.image_size
        rng = np.random.default_rng(0)
        images = rng.integers(0, 255, (2, h, w, 3), dtype=np.uint8)

        live = eval_step(params, frozen, images)
        from podtpu.train.step import split_eval_output
        det, _, _ = split_eval_output(live)

        loaded = ExportedModel(path)
        assert loaded.image_size == (h, w)
        assert loaded.batch_size == 2
        out = loaded(images)
        np.testing.assert_allclose(out["scores"], np.asarray(det.scores),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(out["boxes"], np.asarray(det.boxes),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(out["labels"], np.asarray(det.labels))
        np.testing.assert_array_equal(out["valid"], np.asarray(det.valid))

    def test_bare_artifact_loads_without_meta(self, exported, tmp_path):
        _, path = exported
        bare = tmp_path / "bare.stablehlo"
        bare.write_bytes(open(path, "rb").read())
        loaded = ExportedModel(str(bare))
        assert loaded.labels is None
        assert loaded.batch_size == 2

    def test_cli_command(self, exported, tmp_path):
        model_dir, _ = exported
        from click.testing import CliRunner

        from podtpu.cli import cli

        out = tmp_path / "cli_export.stablehlo"
        res = CliRunner().invoke(cli, [
            "export-model", "--model-dir", os.path.dirname(model_dir),
            "--model", os.path.basename(model_dir),
            "--platforms", "cpu", "-o", str(out)])
        assert res.exit_code == 0, res.output
        assert out.exists() and "exported:" in res.output

    def test_rejects_float_input(self, exported):
        _, path = exported
        loaded = ExportedModel(path)
        h, w = loaded.image_size
        with pytest.raises(TypeError, match="uint8"):
            loaded(np.zeros((2, h, w, 3), np.float32))
