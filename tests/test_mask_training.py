"""Mask R-CNN end-to-end: polygon annotations -> mask targets -> training."""
import os

import numpy as np
import pytest

from podtpu.core.config import Config, DataConfig, ModelConfig, TrainConfig
from podtpu.data.dataset import DetectionDataset
from tests.conftest import tiny_config
from tests.synthetic import ellipse_polygon, make_project


class TestPolygonTargets:
    def test_polygon_rasterize(self):
        poly = ellipse_polygon(8, 8, 16, 16, "p", points=24)
        mask = poly.rasterize(32, 32, scale=1.0)
        assert mask.shape == (32, 32)
        # Centre filled, far corner empty; area approximates the ellipse.
        assert mask[16, 16] == 1
        assert mask[0, 0] == 0
        area = mask.sum()
        assert abs(area - np.pi * 8 * 8) / (np.pi * 64) < 0.2

    def test_dataset_emits_masks(self, tmp_path):
        project = make_project(str(tmp_path), num_images=3, polygons=True)
        ds = DetectionDataset(project, image_size=(128, 128), max_gt=8,
                              with_masks=True, mask_stride=4)
        s = ds.load(0)
        assert s.masks is not None
        assert s.masks.shape == (8, 32, 32)
        # Each valid gt has a nonempty mask roughly inside its box.
        for j in np.flatnonzero(s.valid):
            assert s.masks[j].sum() > 0
            ys, xs = np.nonzero(s.masks[j])
            x1, y1, x2, y2 = s.boxes[j] / 4
            assert xs.min() >= np.floor(x1) - 1
            assert xs.max() <= np.ceil(x2) + 1

    def test_rectangle_fallback_masks(self, tmp_path):
        project = make_project(str(tmp_path), num_images=2, polygons=False)
        ds = DetectionDataset(project, image_size=(128, 128), max_gt=8,
                              with_masks=True, mask_stride=4)
        s = ds.load(0)
        j = int(np.flatnonzero(s.valid)[0])
        x1, y1, x2, y2 = s.boxes[j] / 4
        # Filled-box fallback: mask area ~ box area.
        expected = (x2 - x1) * (y2 - y1)
        assert abs(s.masks[j].sum() - expected) / max(expected, 1) < 0.35


class TestMaskTrainE2E:
    @pytest.mark.slow
    def test_train_with_masks(self, tmp_path):
        from podtpu.train.train import train

        project = make_project(str(tmp_path / "imgs"), num_images=6,
                               polygons=True)
        cfg = tiny_config()
        out = train(
            project,
            labels=["particle"],
            output_dir=str(tmp_path / "models"),
            name="maskrcnn",
            batch_size=2,
            max_epochs=2,
            alrs_epochs=2,
            alrs_startup_factor=1,
            config=cfg,
            num_workers=2,
            with_mask=True,
        )
        assert os.path.isdir(out)
        # Saved config records the mask head.
        from podtpu.train.checkpoints import load_model
        params, frozen, model_cfg, labels = load_model(out)
        assert model_cfg.with_mask
        assert "mask_head" in params
        # Segm COCO metrics ran and were persisted alongside bbox results.
        assert os.path.exists(os.path.join(out, "results_segm.txt"))
        with open(os.path.join(out, "results_segm.txt")) as fp:
            lines = fp.read().strip().splitlines()
        assert len(lines) == 12

        # Tiled inference on the mask model carries instance polygons in
        # scan coordinates (parity with infer()'s CVAT polygon export).
        import numpy as np
        from PIL import Image

        from podtpu.infer.tiled import infer_tiled

        imgs = sorted((tmp_path / "imgs").glob("*.jpg"))[:2]
        tiles = [np.asarray(Image.open(p)) for p in imgs]
        scan = np.concatenate(tiles, axis=1)
        # threshold=0: a 2-epoch model's scores are still near the
        # background prior; the polygon plumbing is what's under test.
        dets = infer_tiled(scan, out, threshold=0.0, batch_size=2)
        with_poly = [d for d in dets if d.polygon is not None]
        assert with_poly, "mask model produced no polygons in tiled mode"
        for d in with_poly:
            assert d.polygon.shape[1] == 2
            x1, y1, x2, y2 = d.box
            # Outline stays near its box (within a couple of pixels).
            assert d.polygon[:, 0].min() >= x1 - 2
            assert d.polygon[:, 0].max() <= x2 + 2
            assert d.polygon[:, 1].min() >= y1 - 2
            assert d.polygon[:, 1].max() <= y2 + 2
