"""Loader, warmup schedule and profiling-utility tests."""
import numpy as np
import pytest

from podtpu.core.config import Config, TrainConfig
from podtpu.core.profiling import StepTimer
from podtpu.data.dataset import DetectionDataset, train_test_split
from podtpu.data.loader import Loader
from podtpu.train.step import warmup_factor
from tests.synthetic import make_project


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("loader_imgs")
    project = make_project(str(root), num_images=5)
    return DetectionDataset(project, image_size=(64, 64), max_gt=4)


class TestDecodeCache:
    def _project(self, tmp_path):
        return make_project(str(tmp_path / "imgs"), num_images=5)

    def test_cache_hits_skip_decode(self, tmp_path, monkeypatch):
        from podtpu.core import native

        ds = DetectionDataset(self._project(tmp_path), image_size=(64, 64),
                              max_gt=4, cache=True)
        first = ds.load_batch([0, 1, 2])
        calls = []
        monkeypatch.setattr(
            native, "decode_resize_batch",
            lambda paths, size: calls.append(paths) or (_ for _ in ()).throw(
                AssertionError("decode called on cached batch")))
        second = ds.load_batch([2, 0, 1])
        assert calls == []
        by_idx = {s.index: s for s in first}
        for s in second:
            np.testing.assert_array_equal(s.image, by_idx[s.index].image)
            np.testing.assert_array_equal(s.boxes, by_idx[s.index].boxes)

    def test_partial_batch_decodes_only_missing(self, tmp_path, monkeypatch):
        from podtpu.core import native

        ds = DetectionDataset(self._project(tmp_path), image_size=(64, 64),
                              max_gt=4, cache=True)
        ds.load_batch([0, 1])
        seen = []
        orig = native.decode_resize_batch
        monkeypatch.setattr(
            native, "decode_resize_batch",
            lambda paths, size: seen.append(list(paths)) or orig(paths, size))
        out = ds.load_batch([0, 3, 1, 4])
        assert [s.index for s in out] == [0, 3, 1, 4]
        assert len(seen) == 1 and len(seen[0]) == 2  # only 3 and 4 decoded

    def test_auto_disables_over_budget(self, tmp_path):
        ds = DetectionDataset(self._project(tmp_path), image_size=(64, 64),
                              max_gt=4, cache="auto", cache_budget_bytes=1)
        assert ds._cache is None
        ds2 = DetectionDataset(self._project(tmp_path), image_size=(64, 64),
                               max_gt=4, cache="auto")
        assert ds2._cache is not None  # 5 tiny images fit 2 GiB

    def test_cache_false_disables(self, tmp_path):
        ds = DetectionDataset(self._project(tmp_path), image_size=(64, 64),
                              max_gt=4, cache=False)
        ds.load_batch([0, 1])
        assert ds._cache is None


class TestDecodeFailure:
    def test_unreadable_image_marked_invalid(self, tmp_path, capsys):
        """A missing/corrupt image file yields a weight-0 sample instead of
        crashing the loader (the reference skips unreadable images with a
        print at project load; we extend the policy to decode time)."""
        project = make_project(str(tmp_path / "imgs"), num_images=4)
        # Corrupt one file and delete another.
        metas = list(project.image_dict.values())
        with open(metas[1].full_path, "wb") as fp:
            fp.write(b"not an image")
        import os
        os.remove(metas[2].full_path)
        ds = DetectionDataset(project, image_size=(64, 64), max_gt=4)
        loader = Loader(ds, 2, shuffle=False, num_workers=2)
        batches = list(loader)
        valid = np.concatenate([bv for _, bv in batches])
        assert valid.sum() == 2  # two good images
        # The bad slots carry no gt and a zero canvas.
        bad_batch, bad_valid = batches[1 // 2]
        assert "could not decode" in capsys.readouterr().out

    def test_failed_sample_shape_contract(self, tmp_path):
        project = make_project(str(tmp_path / "imgs"), num_images=2)
        metas = list(project.image_dict.values())
        import os
        os.remove(metas[0].full_path)
        ds = DetectionDataset(project, image_size=(64, 64), max_gt=4,
                              with_masks=True, mask_stride=8)
        s = ds.load(0)
        assert not s.ok
        assert s.image.shape == (64, 64, 3) and not s.valid.any()
        assert s.masks.shape == (4, 8, 8)
        good = ds.load(1)
        assert good.ok


class TestLoader:
    def test_wraparound_batches_static(self, dataset):
        loader = Loader(dataset, batch_size=2, num_workers=2)
        batches = list(loader)
        # 5 images, bs 2 -> 3 batches, last one wrapped.
        assert len(batches) == 3
        for batch, bvalid in batches:
            assert batch["image"].shape == (2, 64, 64, 3)
            assert bvalid.shape == (2,)
        assert batches[-1][1].tolist() == [True, False]

    def test_epoch_shuffle_differs(self, dataset):
        loader = Loader(dataset, batch_size=2, shuffle=True, seed=0,
                        num_workers=1)
        loader.set_epoch(0)
        order0 = [int(i) for b, _ in loader for i in b["index"]]
        loader.set_epoch(1)
        order1 = [int(i) for b, _ in loader for i in b["index"]]
        assert sorted(set(order0)) == list(range(5))
        assert order0 != order1

    def test_empty_indices(self, dataset):
        loader = Loader(dataset, batch_size=2, indices=np.asarray([], int))
        assert len(loader) == 0
        assert list(loader) == []

    def test_split_seeded(self):
        a = train_test_split(10, 0.2, seed=1)
        b = train_test_split(10, 0.2, seed=1)
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])
        assert len(a[0]) == 8 and len(a[1]) == 2
        assert sorted(np.concatenate(a)) == list(range(10))

    def test_split_tiny_dataset_no_test(self):
        tr, te = train_test_split(3, 0.2, seed=1)
        assert len(tr) == 3 and len(te) == 0


class TestWarmup:
    def test_epoch0_ramps(self):
        cfg = Config(train=TrainConfig(warmup_iters=100))
        f0 = warmup_factor(cfg, epoch=0, it=0, iters_in_epoch=1000)
        fm = warmup_factor(cfg, epoch=0, it=50, iters_in_epoch=1000)
        f1 = warmup_factor(cfg, epoch=0, it=100, iters_in_epoch=1000)
        assert f0 == pytest.approx(1 / 1000)
        assert 0.4 < fm < 0.6
        assert f1 == 1.0

    def test_later_epochs_full(self):
        cfg = Config()
        assert warmup_factor(cfg, epoch=1, it=0, iters_in_epoch=10) == 1.0

    def test_short_epoch_caps_warmup(self):
        cfg = Config(train=TrainConfig(warmup_iters=1000))
        # min(1000, iters-1) like the reference engine.py:18-25.
        assert warmup_factor(cfg, epoch=0, it=4, iters_in_epoch=5) == 1.0


class TestStepTimer:
    def test_percentiles(self):
        t = StepTimer(skip_first=0)
        for v in [0.01, 0.02, 0.03, 0.04, 0.05]:
            t._all.append(v)
        assert t.p50 == pytest.approx(0.03)
        assert t.p90 == pytest.approx(0.05)
        assert "ms" in t.summary()

    def test_context_manager(self):
        t = StepTimer(skip_first=0)
        with t:
            pass
        assert len(t._all) == 1
