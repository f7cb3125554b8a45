"""Crop classifier tests: model shapes + end-to-end train/classify on a tiny
synthetic two-class crop folder."""
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from podtpu.models.classifier import CropClassifier
from podtpu.train.classify import (
    classify_crops,
    scan_crop_folders,
    train_classifier,
)


def make_crop_tree(root, n_per_class=12, size=64):
    """Two visually distinct classes: bright discs vs dark stripes."""
    rng = np.random.default_rng(0)
    for cls, maker in [
        ("disc", lambda a: _disc(a, rng)),
        ("stripe", lambda a: _stripe(a, rng)),
    ]:
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            arr = rng.integers(0, 30, (size, size, 3)).astype(np.uint8)
            maker(arr)
            Image.fromarray(arr).save(os.path.join(d, f"{cls}_{i}.png"))


def _disc(arr, rng):
    h, w = arr.shape[:2]
    yy, xx = np.mgrid[0:h, 0:w]
    r = h // 3
    mask = (yy - h // 2) ** 2 + (xx - w // 2) ** 2 < r * r
    arr[mask] = (240, 230, 210)


def _stripe(arr, rng):
    arr[:: 6] = (180, 40, 40)


class TestCropClassifier:
    def test_model_shapes(self):
        model = CropClassifier(num_classes=5, dtype=jnp.float32)
        x = jnp.zeros((2, 64, 64, 3))
        variables = model.init(jax.random.key(0), x)
        logits = model.apply(variables, x)
        assert logits.shape == (2, 5)
        assert np.isfinite(np.asarray(logits)).all()

    def test_scan_crop_folders(self, tmp_path):
        make_crop_tree(str(tmp_path), n_per_class=3)
        paths, labels, names = scan_crop_folders(str(tmp_path))
        assert names == ["disc", "stripe"]
        assert len(paths) == 6
        assert sorted(set(labels)) == [0, 1]

    def test_train_and_classify_e2e(self, tmp_path):
        crops = tmp_path / "crops"
        make_crop_tree(str(crops), n_per_class=10, size=64)
        out = train_classifier(
            str(crops), output_dir=str(tmp_path / "models"), name="clf",
            batch_size=8, image_size=64, max_epochs=8, alrs_epochs=2,
            alrs_startup_factor=1, lr=3e-3)
        assert os.path.exists(os.path.join(out, "classifier.msgpack"))
        assert os.path.exists(os.path.join(out, "labels.txt"))
        result = classify_crops(str(crops / "disc"), out, batch_size=8)
        assert len(result) == 10
        # The two classes are trivially separable; expect mostly correct.
        correct = sum(1 for v in result.values() if v == "disc")
        assert correct >= 7
