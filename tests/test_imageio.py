"""High-bit-depth-safe decode (podtpu/data/imageio.py).

PIL's ``convert("RGB")`` saturates 16-bit samples to white; every product
decode surface funnels through ``pil_to_rgb`` instead.  The reference has
the same latent bug via PIL/skimage (`dataset.py:18`, `crop.py:16`).
"""
import numpy as np
import pytest
from PIL import Image

from podtpu.data.imageio import pil_to_rgb, read_rgb


def _write_tiff16(path, arr8):
    """16-bit grayscale TIFF carrying arr8's content (x257 expansion)."""
    arr16 = arr8.astype(np.uint16) * 257
    Image.fromarray(arr16, mode="I;16").save(path)


class TestPilToRgb:
    def test_uint8_passthrough(self):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 256, (20, 30, 3)).astype(np.uint8)
        out = pil_to_rgb(Image.fromarray(arr))
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, arr)

    def test_16bit_tiff_not_saturated(self, tmp_path):
        """A mid-gray 16-bit TIFF must decode to mid-gray, not white."""
        rng = np.random.default_rng(1)
        gray8 = rng.integers(30, 90, (24, 16)).astype(np.uint8)
        path = tmp_path / "scan16.tif"
        _write_tiff16(str(path), gray8)
        out = read_rgb(str(path))
        assert out.shape == (24, 16, 3)
        # convert("RGB") would clip every sample (>=30*257=7710 > 255) to
        # 255; the normalised decode recovers the 8-bit values exactly.
        np.testing.assert_array_equal(out[..., 0], gray8)
        np.testing.assert_array_equal(out[..., 1], gray8)

    def test_float_mode_scaled_by_max(self):
        arr = np.linspace(0.0, 1000.0, 64, dtype=np.float32).reshape(8, 8)
        out = pil_to_rgb(Image.fromarray(arr, mode="F"))
        assert out.max() == 255 and out.min() == 0

    def test_16bit_through_infer_tiled_path_input(self, tmp_path,
                                                  synthetic_root,
                                                  trained_model):
        """The CLI tiled path (a file PATH, not an array) must range-
        normalise a 16-bit TIFF: detections match the uint8 original."""
        from podtpu.infer.tiled import infer_tiled

        imgs = sorted((synthetic_root / "images").glob("*.jpg"))[:1]
        arr8 = np.asarray(Image.open(imgs[0]).convert("L"))
        tif = tmp_path / "scan.tif"
        _write_tiff16(str(tif), arr8)
        rgb8 = np.repeat(arr8[..., None], 3, axis=2)
        # The path branch must recover the 8-bit pixel content exactly
        # (convert('RGB') would saturate it to white)...
        np.testing.assert_array_equal(read_rgb(str(tif)), rgb8)
        # ...and feed it to the detector identically to the array branch
        # (detection-list equality; the lists may be empty on a grayscale
        # tile — pixel equality above is the normalisation proof).
        dets8 = infer_tiled(rgb8, trained_model, threshold=0.0,
                            batch_size=4)
        dets16 = infer_tiled(str(tif), trained_model, threshold=0.0,
                             batch_size=4)
        assert len(dets16) == len(dets8)
        for a, b in zip(dets8, dets16):
            assert np.allclose(a.box, b.box, atol=1e-3)
