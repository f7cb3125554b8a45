"""Runtime setup + loader placement tests."""
import os

import numpy as np

import jax


class TestCompilationCache:
    def test_enable_sets_cache_dir(self, tmp_path, monkeypatch):
        from podtpu.core.setup import enable_compilation_cache

        monkeypatch.delenv("PODTPU_NO_COMPILE_CACHE", raising=False)
        d = enable_compilation_cache(str(tmp_path / "cache"))
        assert d == str(tmp_path / "cache")
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

    def test_disable_env(self, monkeypatch):
        from podtpu.core.setup import enable_compilation_cache

        monkeypatch.setenv("PODTPU_NO_COMPILE_CACHE", "1")
        assert enable_compilation_cache() == ""


class TestLoaderPlacement:
    def test_place_puts_batches_on_device(self, synthetic_root):
        from podtpu.data.dataset import DetectionDataset
        from podtpu.data.loader import Loader
        from tests.synthetic import make_project

        project = make_project(str(synthetic_root / "images"), num_images=4)
        ds = DetectionDataset(project, image_size=(64, 64), max_gt=4)
        loader = Loader(ds, 2, shuffle=False, num_workers=1,
                        place=jax.devices()[0])
        batches = list(loader)
        assert len(batches) == 2
        batch, bvalid = batches[0]
        # Values are committed jax arrays, not numpy.
        assert isinstance(batch["image"], jax.Array)
        assert batch["image"].dtype == np.uint8
        assert isinstance(bvalid, np.ndarray)  # host-side mask stays numpy
