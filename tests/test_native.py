"""Native C++ runtime tests: decode pipeline parity + COCO matcher parity."""
import os

import numpy as np
import pytest
from PIL import Image

from podtpu.core import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


class TestNativeDecode:
    def make_images(self, tmp_path, n=6):
        rng = np.random.default_rng(0)
        paths = []
        for i in range(n):
            h, w = int(rng.integers(40, 200)), int(rng.integers(40, 200))
            arr = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            ext = ".png" if i % 2 == 0 else ".jpg"
            p = tmp_path / f"im{i}{ext}"
            Image.fromarray(arr).save(p)
            paths.append(str(p))
        return paths

    def test_batch_decode_shapes_and_scale(self, tmp_path):
        paths = self.make_images(tmp_path)
        res = native.decode_resize_batch(paths, (128, 160), num_threads=3)
        assert res is not None
        canv, scales, orig = res
        assert canv.shape == (6, 128, 160, 3)
        assert canv.dtype == np.uint8
        for i in range(6):
            h, w = orig[i]
            assert scales[i] == pytest.approx(min(128 / h, 160 / w), rel=1e-5)

    @pytest.mark.parametrize("mode_comp", [
        ("RGB", None), ("RGB", "tiff_lzw"), ("RGB", "tiff_deflate"),
        ("L", None)])
    def test_tiff_decodes_exactly(self, tmp_path, mode_comp):
        """TIFF (the micrograph-scan format; reference rglobs tiff/tif,
        `miso/object_detection/inference.py:78-88`) decodes natively,
        byte-identical to PIL, across compressions and grayscale."""
        mode, compression = mode_comp
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 255, (90, 70, 3)).astype(np.uint8)
        im = Image.fromarray(arr)
        if mode == "L":
            im = im.convert("L")
            arr = np.stack([np.asarray(im)] * 3, axis=-1)
        p = tmp_path / f"scan_{compression or 'raw'}_{mode}.tif"
        im.save(p, compression=compression)
        # Canvas exactly the image size: decode is 1:1, so the native
        # output must equal the source bytes.
        res = native.decode_resize_batch([str(p)], (90, 70))
        assert res is not None
        canv, scales, orig = res
        assert tuple(orig[0]) == (90, 70)
        assert scales[0] == pytest.approx(1.0)
        np.testing.assert_array_equal(canv[0], arr)

    def test_png_matches_python_path(self, tmp_path):
        from podtpu.data.dataset import fit_resize

        rng = np.random.default_rng(1)
        arr = rng.integers(0, 255, (77, 55, 3)).astype(np.uint8)
        p = tmp_path / "x.png"
        Image.fromarray(arr).save(p)
        res = native.decode_resize_batch([str(p)], (128, 128))
        canv = res[0][0]
        resized, scale = fit_resize(arr, (128, 128))
        want = np.zeros((128, 128, 3), np.uint8)
        want[: resized.shape[0], : resized.shape[1]] = resized
        # cv2 uses fixed-point bilinear; allow quantisation differences
        # (uint8 canvases: compare in int space).
        assert np.abs(canv.astype(int) - want.astype(int)).max() <= 5

    def test_missing_file_returns_none(self, tmp_path):
        res = native.decode_resize_batch([str(tmp_path / "nope.jpg")],
                                         (64, 64))
        assert res is None

    def test_dataset_load_batch_uses_native(self, tmp_path):
        from tests.synthetic import make_project
        from podtpu.data.dataset import DetectionDataset

        project = make_project(str(tmp_path), num_images=4)
        ds = DetectionDataset(project, image_size=(128, 128), max_gt=8)
        batch_samples = ds.load_batch([0, 1, 2, 3])
        single = [ds.load(i) for i in range(4)]
        for a, b in zip(batch_samples, single):
            assert np.abs(a.image.astype(int)
                          - b.image.astype(int)).max() <= 5
            assert np.allclose(a.boxes, b.boxes, atol=1e-4)
            assert a.scale == pytest.approx(b.scale)


class TestNativeCocoMatch:
    def test_matches_python_matcher(self):
        from podtpu.train.coco_metrics import COCOEvaluator, IOU_THRS

        rng = np.random.default_rng(2)
        for _ in range(20):
            d, g = int(rng.integers(1, 12)), int(rng.integers(1, 8))
            iou = rng.uniform(0, 1, (d, g))
            g_ig = rng.uniform(0, 1, g) > 0.7
            g_order = np.argsort(g_ig, kind="stable")
            iou = iou[:, g_order]
            g_ig = g_ig[g_order]
            area = rng.uniform(10, 5000, d)
            rng_range = (0.0, 1024.0)
            got = native.coco_match(iou, g_ig, area, IOU_THRS, rng_range)
            assert got is not None
            # Python reference (force fallback by calling internals).
            os.environ["PODTPU_DISABLE_NATIVE"] = "1"
            try:
                import importlib
                import podtpu.core.native as nat
                # The python fallback lives inside COCOEvaluator._match;
                # emulate it directly here.
                D, G = iou.shape
                T = len(IOU_THRS)
                dtm = np.zeros((T, D), bool)
                dtig = np.zeros((T, D), bool)
                for ti, thr in enumerate(IOU_THRS):
                    used = np.zeros(G, bool)
                    for dd in range(D):
                        best, best_iou = -1, thr - 1e-10
                        for gg in range(G):
                            if used[gg]:
                                continue
                            if best > -1 and not g_ig[best] and g_ig[gg]:
                                break
                            if iou[dd, gg] < best_iou:
                                continue
                            best_iou = iou[dd, gg]
                            best = gg
                        if best == -1:
                            continue
                        used[best] = True
                        dtm[ti, dd] = True
                        dtig[ti, dd] = g_ig[best]
                    out = (area < rng_range[0]) | (area > rng_range[1])
                    dtig[ti] |= (~dtm[ti]) & out
            finally:
                del os.environ["PODTPU_DISABLE_NATIVE"]
            assert np.array_equal(got[0], dtm)
            assert np.array_equal(got[1], dtig)
