"""CVAT client tests against the in-process fake server."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from podtpu.data.cvat.client import Cvat, CvatProject, CvatTask
from podtpu.data.project import Project
from podtpu.data.annotation import RectangleAnnotation
from tests.fake_cvat import FakeCvatServer, FakeCvatState

LABELS = [{"id": 10, "name": "Coccolith", "color": "#ff0000"},
          {"id": 11, "name": "Foram", "color": "#00ff00"}]


@pytest.fixture
def image_root(tmp_path):
    root = tmp_path / "data"
    # The client appends <data_location>/raw to an explicit root.
    raw = root / "7" / "raw"
    raw.mkdir(parents=True)
    for name in ["frame0.jpg", "frame1.jpg", "frame2.jpg", "frame3.jpg"]:
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(raw / name)
    return str(root)


def make_state(shapes=None, tracks=None):
    state = FakeCvatState()
    state.add_task(5, "plankton_task", LABELS,
                   ["frame0.jpg", "frame1.jpg", "frame2.jpg", "frame3.jpg"],
                   shapes=shapes, tracks=tracks)
    return state


class TestLoad:
    @pytest.mark.parametrize("api", ["v1", "v2"])
    def test_load_shapes(self, image_root, api):
        shapes = [
            {"id": 1, "type": "rectangle", "frame": 0, "label_id": 10,
             "points": [10.0, 20.0, 50.0, 60.0], "outside": False},
            {"id": 2, "type": "polygon", "frame": 1, "label_id": 11,
             "points": [0.0, 0.0, 10.0, 0.0, 10.0, 10.0], "outside": False},
        ]
        with FakeCvatServer(make_state(shapes=shapes)) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, api=api,
                            debug=False)
            task.load()
        project = task.project
        assert task.name == "plankton_task"
        assert project.task_names == {5: "plankton_task"}
        assert set(project.label_dict) == {"Coccolith", "Foram"}
        assert len(project) == 4
        images = {im.frame_id: im for im in project.images}
        (box,) = images[0].boxes
        assert box.label == "Coccolith"
        assert box.bounds == (10.0, 20.0, 40.0, 40.0)
        # Polygon imported via its bounding box (reference skipped it).
        (poly_box,) = images[1].boxes
        assert poly_box.label == "Foram"
        assert poly_box.bounds == (0.0, 0.0, 10.0, 10.0)

    def test_points_shapes_become_keypoints(self, image_root):
        """CVAT 'points' shapes (skipped by the reference,
        cvat_web_api.py:279-280) attach to an instance: by shared group
        id first, else the smallest containing box, else a standalone
        box over their extent."""
        shapes = [
            # Grouped pair: rectangle + points share group 7.
            {"id": 1, "type": "rectangle", "frame": 0, "label_id": 10,
             "points": [10.0, 10.0, 50.0, 50.0], "group": 7,
             "outside": False},
            {"id": 2, "type": "points", "frame": 0, "label_id": 10,
             "points": [20.0, 20.0, 30.0, 40.0], "group": 7,
             "outside": False},
            # Ungrouped points inside two nested boxes -> the smaller one.
            {"id": 3, "type": "rectangle", "frame": 1, "label_id": 10,
             "points": [0.0, 0.0, 30.0, 30.0], "outside": False},
            {"id": 4, "type": "rectangle", "frame": 1, "label_id": 10,
             "points": [5.0, 5.0, 20.0, 20.0], "outside": False},
            {"id": 5, "type": "points", "frame": 1, "label_id": 10,
             "points": [10.0, 10.0, 12.0, 12.0], "outside": False,
             "occluded": True},
            # Free points, no box anywhere near -> standalone box.
            {"id": 6, "type": "points", "frame": 2, "label_id": 11,
             "points": [1.0, 2.0, 9.0, 6.0], "outside": False},
        ]
        with FakeCvatServer(make_state(shapes=shapes)) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, debug=False)
            task.load()
        images = {im.frame_id: im for im in task.project.images}
        (grouped,) = images[0].boxes
        assert grouped.keypoints == [(20.0, 20.0, 2.0), (30.0, 40.0, 2.0)]
        big, small = sorted(images[1].boxes, key=lambda b: -b.area)
        assert big.keypoints is None
        # Occluded points carry visibility 1.
        assert small.keypoints == [(10.0, 10.0, 1.0), (12.0, 12.0, 1.0)]
        (standalone,) = images[2].boxes
        assert standalone.label == "Foram"
        # Extent padded by 2 px (a single landmark must not create a
        # degenerate zero-area gt).
        assert standalone.bounds == (-1.0, 0.0, 12.0, 8.0)
        assert standalone.keypoints == [(1.0, 2.0, 2.0), (9.0, 6.0, 2.0)]

    def test_split_skeleton_and_track_grouped_points(self, image_root):
        """Two points shapes in one group EXTEND the instance's skeleton;
        points grouped with a rectangle TRACK attach to the track's
        keyframe box instead of duplicating as a standalone instance."""
        shapes = [
            {"id": 1, "type": "rectangle", "frame": 0, "label_id": 10,
             "points": [10.0, 10.0, 50.0, 50.0], "group": 3,
             "outside": False},
            {"id": 2, "type": "points", "frame": 0, "label_id": 10,
             "points": [20.0, 20.0], "group": 3, "outside": False},
            {"id": 3, "type": "points", "frame": 0, "label_id": 10,
             "points": [30.0, 40.0], "group": 3, "outside": False},
        ]
        tracks = [{
            "id": 99, "label_id": 10, "frame": 1, "group": 5,
            "shapes": [{"type": "rectangle", "frame": 1, "outside": False,
                        "points": [0.0, 0.0, 20.0, 20.0]}]}]
        extra = [{"id": 4, "type": "points", "frame": 1, "label_id": 10,
                  "points": [5.0, 5.0], "group": 5, "outside": False}]
        with FakeCvatServer(make_state(shapes=shapes + extra,
                                       tracks=tracks)) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, debug=False)
            task.load()
        images = {im.frame_id: im for im in task.project.images}
        (grouped,) = images[0].boxes
        assert grouped.keypoints == [(20.0, 20.0, 2.0), (30.0, 40.0, 2.0)]
        (track_box,) = images[1].boxes  # no standalone duplicate
        assert track_box.keypoints == [(5.0, 5.0, 2.0)]

    def test_track_interpolation(self, image_root):
        tracks = [{
            "id": 99, "label_id": 10, "frame": 0,
            "shapes": [
                {"type": "rectangle", "frame": 0, "outside": False,
                 "points": [0.0, 0.0, 10.0, 10.0]},
                {"type": "rectangle", "frame": 3, "outside": False,
                 "points": [30.0, 30.0, 40.0, 40.0]},
            ]}]
        with FakeCvatServer(make_state(tracks=tracks)) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, debug=False)
            task.load()
        images = {im.frame_id: im for im in task.project.images}
        # Keyframes present.
        assert images[0].boxes[0].bounds == (0, 0, 10, 10)
        assert images[3].boxes[0].bounds == (30, 30, 10, 10)
        # Interpolated boxes on their own frames (reference bug fixed).
        assert images[1].boxes[0].bounds == (10, 10, 10, 10)
        assert images[2].boxes[0].bounds == (20, 20, 10, 10)
        assert images[1].boxes[0].track_id == 99

    def test_missing_image_skipped(self, image_root, capsys):
        state = FakeCvatState()
        state.add_task(5, "t", LABELS, ["frame0.jpg", "missing.jpg"])
        with FakeCvatServer(state) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, debug=False)
            task.load()
        assert len(task.project) == 1
        assert "could not be found" in capsys.readouterr().out


class TestUpload:
    def test_add_shapes_patches_annotations(self, image_root):
        state = make_state()
        with FakeCvatServer(state) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, debug=False)
            task.load()
            detections = Project()
            im = task.project.images[0]
            im.boxes.append(RectangleAnnotation(1.2, 2.7, 10.0, 10.0,
                                                "Coccolith", score=0.9))
            detections.add_image(im)
            task.add_shapes(detections)
        patch = [p for p in state.patches if "annotations" in p["path"]][-1]
        assert "action=create" in patch["path"]
        body = patch["body"]
        assert body["version"] == 0
        (shape,) = body["shapes"]
        assert shape["type"] == "rectangle"
        assert shape["label_id"] == 10
        assert shape["frame"] == im.frame_id
        # coords_int rounding.
        assert shape["points"] == [1, 3, 11, 13]

    def test_add_shapes_uploads_polygons_and_keypoints(self, image_root):
        """PolygonAnnotations upload as real polygon shapes; instance
        keypoints upload as a companion 'points' shape sharing a fresh
        group id with their box."""
        from podtpu.data.annotation import PolygonAnnotation

        state = make_state()
        with FakeCvatServer(state) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, debug=False)
            task.load()
            detections = Project()
            im = task.project.images[0]
            im.boxes.append(PolygonAnnotation(
                [1.0, 9.0, 5.0], [1.0, 1.0, 8.0], "Coccolith", score=0.8))
            im.boxes.append(RectangleAnnotation(
                10, 10, 20, 20, "Foram", score=0.9,
                keypoints=[(15.0, 15.0, 2.0), (25.0, 20.0, 0.5)]))
            detections.add_image(im)
            task.add_shapes(detections)
        patch = [p for p in state.patches if "annotations" in p["path"]][-1]
        shapes = patch["body"]["shapes"]
        assert [s["type"] for s in shapes] == ["polygon", "rectangle",
                                               "points"]
        poly, rect, pts = shapes
        assert poly["points"] == [1.0, 1.0, 9.0, 1.0, 5.0, 8.0]
        assert poly["label_id"] == 10
        # Box + its keypoints share a fresh nonzero group id.
        assert rect["group"] == pts["group"] > 0
        assert pts["points"] == [15.0, 15.0, 25.0, 20.0]
        assert pts["label_id"] == 11
        assert pts["occluded"] is False  # confidence-valued v, not COCO 1

    def test_add_shapes_group_ids_and_visibility_filter(self, image_root):
        """Fresh group ids start past the task's EXISTING groups, v=0
        placeholder triples never upload, and an all-occluded (v==1)
        skeleton marks its points shape occluded."""
        shapes = [{"id": 1, "type": "rectangle", "frame": 0,
                   "label_id": 10, "points": [1.0, 1.0, 5.0, 5.0],
                   "group": 7, "outside": False}]
        state = make_state(shapes=shapes)
        with FakeCvatServer(state) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, debug=False)
            task.load()
            detections = Project()
            im = task.project.images[0]
            im.boxes = []  # upload only the new detections
            im.boxes.append(RectangleAnnotation(
                10, 10, 20, 20, "Foram", score=0.9,
                keypoints=[(15.0, 15.0, 1.0), (0.0, 0.0, 0.0),
                           (25.0, 20.0, 1.0)]))
            im.boxes.append(RectangleAnnotation(
                40, 40, 10, 10, "Foram", score=0.9,
                keypoints=[(0.0, 0.0, 0.0)]))  # all placeholders
            detections.add_image(im)
            task.add_shapes(detections)
        patch = [p for p in state.patches if "annotations" in p["path"]][-1]
        uploaded = patch["body"]["shapes"]
        # Existing rect (group 7) isn't in the upload; the new pair's
        # group starts past it.  The all-placeholder box gets NO points
        # shape and NO group.
        kinds = [s["type"] for s in uploaded]
        assert kinds == ["rectangle", "points", "rectangle"]
        rect, pts, bare = uploaded
        assert rect["group"] == pts["group"] == 8
        assert bare["group"] == 0
        # v=0 triple filtered out; all-occluded skeleton flagged.
        assert pts["points"] == [15.0, 15.0, 25.0, 20.0]
        assert pts["occluded"] is True

    def test_add_missing_labels(self, image_root):
        state = make_state()
        with FakeCvatServer(state) as srv:
            task = CvatTask(srv.url, 5, image_root=image_root, debug=False)
            task.load()
            detections = Project()
            detections.add_label(None, "Coccolith_NV", "#123456")
            task.add_missing_labels(detections)
            # New label registered server-side and refreshed client-side.
            assert "Coccolith_NV" in task.label_dict_by_name
        label_patch = [p for p in state.patches
                       if "projects/1" in p["path"]][-1]
        names = [l["name"] for l in label_patch["body"]["labels"]]
        assert names == ["Coccolith_NV"]


class TestProjectAndServer:
    def test_project_load_and_task_listing(self, image_root):
        state = make_state()
        with FakeCvatServer(state) as srv:
            proj = CvatProject(srv.url, 1, debug=False)
            proj.load()
            assert proj.label_to_id == {"Coccolith": 10, "Foram": 11}
            cvat = Cvat(srv.url, debug=False)
            cvat.load()
            assert cvat.id_to_project == {1: "project1"}

    def test_create_task(self, image_root):
        state = make_state()
        with FakeCvatServer(state) as srv:
            proj = CvatProject(srv.url, 1, debug=False, create_task_wait=0)
            new_id = proj.create_task("new_task", ["a.jpg", "b.jpg"])
        assert new_id == 6
        data_post = [p for p in state.posts if "/data" in p["path"]][-1]
        assert data_post["body"]["server_files"] == ["a.jpg", "b.jpg"]
