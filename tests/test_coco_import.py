"""COCO json import/export round-trip tests."""
import json

import numpy as np
import pytest

from podtpu.data.annotation import PolygonAnnotation
from podtpu.data.coco_import import export_coco_json, load_coco_json
from tests.synthetic import make_project


def write_coco(tmp_path):
    coco = {
        "images": [
            {"id": 10, "file_name": "a.jpg", "height": 100, "width": 200},
            {"id": 11, "file_name": "b.jpg", "height": 50, "width": 60},
        ],
        "annotations": [
            {"id": 1, "image_id": 10, "category_id": 1,
             "bbox": [10, 20, 30, 40], "area": 1200, "iscrowd": 0},
            {"id": 2, "image_id": 10, "category_id": 2,
             "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 0,
             "segmentation": [[0, 0, 10, 0, 10, 10, 0, 10]]},
            {"id": 3, "image_id": 11, "category_id": 1,
             "bbox": [5, 5, 20, 20], "area": 400, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "cocco"}, {"id": 2, "name": "foram"}],
    }
    p = tmp_path / "instances.json"
    with open(p, "w") as fp:
        json.dump(coco, fp)
    return str(p)


class TestCocoImport:
    def test_load(self, tmp_path):
        project = load_coco_json(write_coco(tmp_path), "/data/coco")
        assert len(project) == 2
        assert set(project.label_dict) == {"cocco", "foram"}
        by_path = {im.path: im for im in project.images}
        a = by_path["a.jpg"]
        assert len(a.boxes) == 2
        rect = [b for b in a.boxes if b.label == "cocco"][0]
        assert rect.bounds == (10, 20, 30, 40)
        poly = [b for b in a.boxes if b.label == "foram"][0]
        assert isinstance(poly, PolygonAnnotation)
        assert poly.bounds == (0, 0, 10, 10)
        assert a.full_path == "/data/coco/a.jpg"

    def test_roundtrip(self, tmp_path):
        project = make_project(str(tmp_path / "imgs"), num_images=3,
                               polygons=True)
        out = tmp_path / "export.json"
        export_coco_json(project, str(out))
        back = load_coco_json(str(out), str(tmp_path / "imgs"))
        assert len(back) == 3
        orig = sorted((str(im.path), tuple(np.round(b.bounds, 3)))
                      for im in project.images for b in im.boxes)
        got = sorted((str(im.path), tuple(np.round(b.bounds, 3)))
                     for im in back.images for b in im.boxes)
        assert orig == got
        # Polygons survive as polygons.
        assert any(isinstance(b, PolygonAnnotation)
                   for im in back.images for b in im.boxes)
