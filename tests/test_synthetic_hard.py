"""The hard benchmark generator (tests/synthetic.py::make_hard_project)
produces a well-formed multi-class task: tight in-bounds boxes over real
drawn pixels, bounded occlusion, all five shape classes represented."""
import os

import numpy as np
import pytest
from PIL import Image

from tests.synthetic import HARD_CLASSES, make_hard_project


@pytest.fixture(scope="module")
def hard(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hard"))
    return root, make_hard_project(root, num_images=6,
                                   image_size=(384, 384), max_boxes=14,
                                   seed=3)


def test_classes_and_bounds(hard):
    root, project = hard
    seen = set()
    total = 0
    for meta in project.image_dict.values():
        assert meta.boxes, "every image should carry annotations"
        for b in meta.boxes:
            seen.add(b.label)
            total += 1
            assert 0 <= b.x and 0 <= b.y
            assert b.x + b.width <= 384 and b.y + b.height <= 384
            assert b.width >= 1 and b.height >= 1
    assert seen == set(HARD_CLASSES)
    assert total >= 6 * 4  # crowded scenes, not 1-2 boxes per image


def test_boxes_cover_bright_pixels(hard):
    root, project = hard
    meta = next(iter(project.image_dict.values()))
    arr = np.asarray(Image.open(os.path.join(root, meta.path)))
    for b in meta.boxes:
        x, y, w, h = (int(b.x), int(b.y), int(b.width), int(b.height))
        region = arr[y:y + h, x:x + w]
        # Minimum possible drawn-shape pixel: 0.85*110 + 0.15*bg ≈ 94
        # (background tops out near ~104 only at the extreme bright-ramp
        # corner; typical dark areas sit well below 92, so a box landing
        # nowhere near drawn pixels still fails).
        assert region.max() >= 92, (b.label, region.max())


def test_occlusion_bounded(hard):
    _, project = hard
    for meta in project.image_dict.values():
        boxes = [(b.x, b.y, b.width, b.height) for b in meta.boxes]
        for i in range(len(boxes)):
            for j in range(i + 1, len(boxes)):
                (x1, y1, w1, h1), (x2, y2, w2, h2) = boxes[i], boxes[j]
                ix = max(0.0, min(x1 + w1, x2 + w2) - max(x1, x2))
                iy = max(0.0, min(y1 + h1, y2 + h2) - max(y1, y2))
                inter = ix * iy
                iou = inter / (w1 * h1 + w2 * h2 - inter)
                # Sampled-box IoU is capped at 0.35; tightened boxes can
                # shift slightly, so allow modest slack.
                assert iou <= 0.55, (i, j, iou)


def test_deterministic(tmp_path):
    a = make_hard_project(str(tmp_path / "a"), num_images=2,
                          image_size=(256, 256), seed=11)
    b = make_hard_project(str(tmp_path / "b"), num_images=2,
                          image_size=(256, 256), seed=11)
    boxes_a = [(m.path, x.label, x.bounds) for m in a.image_dict.values()
               for x in m.boxes]
    boxes_b = [(m.path, x.label, x.bounds) for m in b.image_dict.values()
               for x in m.boxes]
    assert boxes_a == boxes_b
