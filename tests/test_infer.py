"""Inference, crop, tiled-scan and CVAT XML tests (using the shared trained
model)."""
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from podtpu.data import ImageMetadata, Project, RectangleAnnotation
from podtpu.data.cvat.xml import load_cvat_dump, write_annotations_xml
from podtpu.infer.crop import crop_objects
from podtpu.infer.inference import infer, infer_directory
from podtpu.infer.tiled import (
    TiledDetection,
    cross_tile_nms,
    greedy_nms,
    infer_tiled,
    tile_origins,
)
from tests.synthetic import make_project


class TestInfer:
    def test_infer_project(self, synthetic_root, trained_model):
        project = make_project(str(synthetic_root / "images"), num_images=10)
        # Strip annotations so images count as unlabelled.
        for im in project.images:
            im.boxes = []
        result = infer(project, trained_model, ["particle"], threshold=0.05,
                       batch_size=2, num_workers=2)
        assert isinstance(result, Project)
        assert len(result) == 10
        boxes = [b for im in result.images for b in im.boxes]
        for b in boxes:
            assert b.label == "particle"
            assert b.score > 0.05
            assert b.width > 0 and b.height > 0

    def test_infer_nv_suffix(self, synthetic_root, trained_model):
        project = make_project(str(synthetic_root / "images"), num_images=4)
        for im in project.images:
            im.boxes = []
        result = infer(project, trained_model, ["particle"], threshold=0.05,
                       batch_size=2, nv=True, num_workers=2)
        assert "particle_NV" in result.label_dict or all(
            b.label == "particle_NV"
            for im in result.images for b in im.boxes)

    def test_infer_skips_labelled_images(self, synthetic_root, trained_model):
        project = make_project(str(synthetic_root / "images"), num_images=4)
        # All images have annotations -> nothing to infer on.
        result = infer(project, trained_model, ["particle"], batch_size=2,
                       num_workers=2)
        assert len(result) == 0

    def test_infer_directory(self, synthetic_root, trained_model):
        result = infer_directory(str(synthetic_root / "images"),
                                 trained_model, ["particle"],
                                 threshold=0.05, batch_size=2, num_workers=2)
        assert len(result) == 10

    def test_infer_directory_missing_raises(self, trained_model):
        with pytest.raises(ValueError):
            infer_directory("/nonexistent/dir", trained_model, ["particle"])


class TestCrop:
    def make_annotated_project(self, root):
        project = make_project(str(root), num_images=3, seed=5)
        return project

    def test_crop_layout_and_naming(self, tmp_path):
        project = self.make_annotated_project(tmp_path / "imgs")
        out = tmp_path / "crops"
        n = crop_objects(project, str(out))
        assert n == sum(len(im.boxes) for im in project.images)
        # task-id - task-name folder layout is used when task_names set.
        project.task_names[1] = "taskname"
        out2 = tmp_path / "crops2"
        crop_objects(project, str(out2))
        assert (out2 / "1 - taskname" / "particle").is_dir()
        files = list((out2 / "1 - taskname" / "particle").iterdir())
        assert files
        # <stem>_<x>_<y>_<w>_<h><suffix> naming.
        stem = files[0].name
        parts = stem.rsplit(".", 1)[0].split("_")
        assert len(parts) >= 5

    def test_crop_dimensions(self, tmp_path):
        project = Project()
        img_dir = tmp_path / "i"
        img_dir.mkdir()
        arr = np.zeros((100, 100, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / "a.png")
        meta = ImageMetadata("a.png", str(img_dir), 0, 0)
        meta.add_annotation(RectangleAnnotation(10, 20, 30, 40, "thing"))
        project.add_image(meta)
        project.task_names = {}
        crop_objects(project, str(tmp_path / "out"))
        crop = Image.open(tmp_path / "out" / "thing" / "a_10_20_30_40.png")
        assert crop.size == (30, 40)

    def test_crop_relative_to(self, tmp_path):
        project = self.make_annotated_project(tmp_path / "in" / "sub")
        out = tmp_path / "out"
        crop_objects(project, str(out), relative_to=str(tmp_path / "in"))
        assert (out / "sub" / "particle").is_dir()


class TestTiled:
    def test_tile_origins_cover(self):
        xs = tile_origins(300, 128, 96)
        assert xs[0] == 0 and xs[-1] == 300 - 128
        # Full coverage.
        covered = set()
        for x in xs:
            covered.update(range(x, x + 128))
        assert covered == set(range(300))

    def test_tile_origins_small_image(self):
        assert tile_origins(100, 128, 96) == [0]

    def test_greedy_nms(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                         float)
        scores = np.array([0.9, 0.8, 0.7])
        keep = greedy_nms(boxes, scores, 0.5)
        assert sorted(keep.tolist()) == [0, 2]

    def test_cross_tile_nms_class_aware(self):
        d1 = TiledDetection((0, 0, 10, 10), 0.9, 1)
        d2 = TiledDetection((1, 1, 11, 11), 0.8, 1)  # duplicate of d1
        d3 = TiledDetection((0, 0, 10, 10), 0.7, 2)  # other class survives
        out = cross_tile_nms([d1, d2, d3], 0.5)
        assert len(out) == 2
        assert {d.label for d in out} == {1, 2}

    def test_infer_tiled_on_scan(self, synthetic_root, trained_model):
        # Build a 2x2 mosaic scan from synthetic tiles -> 320x320 image.
        imgs = sorted((synthetic_root / "images").glob("*.jpg"))[:4]
        tiles = [np.asarray(Image.open(p)) for p in imgs]
        top = np.concatenate(tiles[:2], axis=1)
        bot = np.concatenate(tiles[2:], axis=1)
        scan = np.concatenate([top, bot], axis=0)
        dets = infer_tiled(scan, trained_model, threshold=0.05,
                           overlap=0.25, batch_size=4)
        for d in dets:
            x1, y1, x2, y2 = d.box
            assert 0 <= x1 <= x2 <= scan.shape[1]
            assert 0 <= y1 <= y2 <= scan.shape[0]
            assert d.label == 1


class TestCvatXml:
    def test_roundtrip(self, tmp_path):
        project = make_project(str(tmp_path / "imgs"), num_images=3)
        xml_path = tmp_path / "annotations.xml"
        write_annotations_xml(project, str(xml_path), task_name="roundtrip")
        back = load_cvat_dump(str(tmp_path))
        assert len(back) == 3
        assert back.task_names[0] == "roundtrip"
        assert set(back.label_dict) == {"particle"}
        orig_boxes = sorted(
            (im.path, b.bounds) for im in project.images for b in im.boxes)
        back_boxes = sorted(
            (im.path, b.bounds) for im in back.images for b in im.boxes)
        assert len(orig_boxes) == len(back_boxes)
        for (p1, b1), (p2, b2) in zip(orig_boxes, back_boxes):
            assert p1 == p2
            assert np.allclose(b1, b2)

    def test_folder_of_folders(self, tmp_path):
        for name in ["taskA", "taskB"]:
            sub = tmp_path / name
            project = make_project(str(sub / "images"), num_images=2,
                                   seed=hash(name) % 100)
            write_annotations_xml(project, str(sub / "annotations.xml"))
        merged = load_cvat_dump(str(tmp_path))
        assert len(merged) == 4

    def test_missing_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_cvat_dump(str(tmp_path))
