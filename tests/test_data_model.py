"""Unit tests for the annotation/project data model (reference parity)."""
import math

import pytest
from lxml import etree

from podtpu.data import (
    ImageMetadata,
    Label,
    PolygonAnnotation,
    Project,
    RectangleAnnotation,
)


def make_image(path="a.jpg", dataset_id=1, frame_id=0, boxes=()):
    im = ImageMetadata(path, "/data", dataset_id, frame_id)
    for b in boxes:
        im.add_annotation(b)
    return im


class TestRectangleAnnotation:
    def test_bounds_and_coords(self):
        r = RectangleAnnotation(10, 20, 30, 40, "cocco")
        assert r.bounds == (10, 20, 30, 40)
        assert r.coords == (10, 20, 40, 60)
        assert r.bounds_int == (10, 20, 30, 40)
        assert r.coords_int == (10, 20, 40, 60)

    def test_int_rounding(self):
        r = RectangleAnnotation(10.6, 20.4, 30.5, 40.49, "x")
        assert r.coords_int == (11, 20, 41, 61)

    def test_iou_identical(self):
        a = RectangleAnnotation(0, 0, 10, 10, "x")
        assert a.iou(a) == pytest.approx(1.0)

    def test_iou_disjoint(self):
        a = RectangleAnnotation(0, 0, 10, 10, "x")
        b = RectangleAnnotation(20, 20, 10, 10, "x")
        assert a.iou(b) == 0.0

    def test_iou_half_overlap(self):
        a = RectangleAnnotation(0, 0, 10, 10, "x")
        b = RectangleAnnotation(5, 0, 10, 10, "x")
        # inter = 50, union = 150
        assert a.iou(b) == pytest.approx(50 / 150)

    def test_centre_point_distance_y_weighted(self):
        a = RectangleAnnotation(0, 0, 10, 10, "x")
        b = RectangleAnnotation(0, 10, 10, 10, "x")  # dy = 10, dx = 0
        assert a.centre_point_distance(b) == pytest.approx(5.0)  # 10 / y_weight 2
        assert a.centre_point_distance(b, y_weight=1) == pytest.approx(10.0)

    def test_cvat_xml_roundtrip(self):
        r = RectangleAnnotation(1.5, 2.5, 3.0, 4.0, "cocco")
        el = r.to_cvat()
        assert el.tag == "box"
        assert el.get("xtl") == "1.5"
        assert el.get("ybr") == "6.5"
        assert el.get("occluded") == "0"
        assert el.get("source") == "manual"
        back = RectangleAnnotation.from_cvat(el)
        assert back.bounds == pytest.approx(r.bounds)
        assert back.label == "cocco"

    def test_cvat_sequenced_attrs(self):
        r = RectangleAnnotation(0, 0, 5, 5, "x")
        el = r.to_cvat_sequenced(7)
        assert el.get("frame") == "7"
        assert el.get("keyframe") == "1"
        assert el.get("outside") == "0"

    def test_json_roundtrip(self):
        r = RectangleAnnotation(1, 2, 3, 4, "x", score=0.75, annotator="model")
        back = RectangleAnnotation.from_json(r.to_json())
        assert back.bounds == r.bounds
        assert back.score == 0.75
        assert back.annotator == "model"


class TestPolygonAnnotation:
    def test_points_roundtrip(self):
        p = PolygonAnnotation([1.0, 2.0, 3.0], [4.0, 5.0, 6.0], "poly")
        el = p.to_cvat()
        assert el.tag == "polygon"
        assert el.get("points") == "1.0,4.0;2.0,5.0;3.0,6.0"
        back = PolygonAnnotation.from_cvat(el)
        assert back.xs == p.xs and back.ys == p.ys

    def test_bounds(self):
        p = PolygonAnnotation([0, 10, 5], [0, 2, 8], "poly")
        assert p.bounds == (0, 0, 10, 8)

    def test_json_roundtrip(self):
        p = PolygonAnnotation([1, 2], [3, 4], "poly", score=0.5)
        back = PolygonAnnotation.from_json(p.to_json())
        assert back.xs == [1, 2] and back.score == 0.5

    def test_bbox_iou(self):
        p = PolygonAnnotation([0, 10, 10, 0], [0, 0, 10, 10], "poly")
        r = RectangleAnnotation(0, 0, 10, 10, "x")
        assert p.iou(r) == pytest.approx(1.0)


class TestImageMetadata:
    def test_identity(self):
        im = make_image("sub/a.jpg", dataset_id=3, frame_id=7)
        assert im.id == "3_7_sub/a.jpg"
        assert im.full_path == "/data/sub/a.jpg"

    def test_has_label(self):
        im = make_image(boxes=[RectangleAnnotation(0, 0, 1, 1, "a")])
        assert im.has_label("a")
        assert im.has_label(["b", "a"])
        assert not im.has_label("b")
        assert sorted(im.labels) == ["a"]


class TestProject:
    def test_add_image_registers_labels(self):
        p = Project()
        p.add_image(make_image(boxes=[RectangleAnnotation(0, 0, 1, 1, "new")]))
        assert "new" in p.label_dict
        assert p.label_names == ["new"]

    def test_keep_and_remove_annotations(self):
        p = Project()
        p.add_image(make_image(boxes=[
            RectangleAnnotation(0, 0, 1, 1, "a"),
            RectangleAnnotation(0, 0, 1, 1, "b"),
        ]))
        p.keep_annotations_with_label("a")
        (im,) = p.images
        assert [b.label for b in im.boxes] == ["a"]
        p.remove_annotations_with_label(["a"])
        assert im.boxes == []

    def test_remove_unlabelled_and_labelled(self):
        p = Project()
        p.add_image(make_image("a.jpg", boxes=[RectangleAnnotation(0, 0, 1, 1, "a")]))
        p.add_image(make_image("b.jpg"))
        q = Project()
        q.add_project(p)
        p.remove_unlabelled_images()
        assert len(p) == 1 and p.images[0].path == "a.jpg"
        q.remove_labelled_images()
        assert len(q) == 1 and q.images[0].path == "b.jpg"

    def test_add_project_duplicate_raises(self):
        p, q = Project(), Project()
        p.add_image(make_image("a.jpg"))
        q.add_image(make_image("a.jpg"))
        with pytest.raises(KeyError):
            p.add_project(q)

    def test_add_project_merges_labels(self):
        p, q = Project(), Project()
        p.add_label(1, "a", "#fff")
        q.add_label(2, "b", "#000")
        q.add_image(make_image("b.jpg"))
        p.add_project(q)
        assert set(p.label_dict) == {"a", "b"}

    def test_rename_label_and_update(self):
        p = Project()
        p.add_image(make_image(boxes=[RectangleAnnotation(0, 0, 1, 1, "old")]))
        p.rename_label("old", "new")
        p.update_label_dict()
        assert p.label_names == ["new"]
        assert p.label_counts() == {"new": 1}

    def test_score_threshold_fixed_semantics(self):
        p = Project()
        p.add_image(make_image(boxes=[
            RectangleAnnotation(0, 0, 1, 1, "a", score=0.9),
            RectangleAnnotation(0, 0, 1, 1, "a", score=0.1),
        ]))
        p.remove_annotations_below_threshold(0.5)
        (im,) = p.images
        assert [b.score for b in im.boxes] == [0.9]

    def test_box_counts_buckets(self):
        p = Project()
        p.add_image(make_image("zero.jpg"))
        p.add_image(make_image("one.jpg", boxes=[RectangleAnnotation(0, 0, 1, 1, "a")]))
        many = make_image("many.jpg", boxes=[
            RectangleAnnotation(0, 0, 1, 1, "a") for _ in range(50)])
        p.add_image(many)
        counts = p.box_counts()
        assert counts == {"0": 1, "1-10": 1, "11-100": 1, "100+": 0}

    def test_summary_runs(self, capsys):
        p = Project()
        p.add_image(make_image(boxes=[RectangleAnnotation(0, 0, 1, 1, "a")]))
        text = p.summary()
        assert "total images: 1" in text
