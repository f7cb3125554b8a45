"""Synthetic micrograph-like dataset helpers for end-to-end tests.

SURVEY.md §4's consequence (c): "synthetic micrograph datasets with known
boxes for end-to-end train/eval" — bright ellipses/rectangles ("particles")
on a noisy dark background, written as real JPEG files behind a real
Project, so the whole decode→train→eval→artifact path is exercised.
"""
from __future__ import annotations

import math
import os
from typing import List, Tuple

import numpy as np
from PIL import Image

from podtpu.data import (
    ImageMetadata,
    PolygonAnnotation,
    Project,
    RectangleAnnotation,
)


def draw_particle(img: np.ndarray, x: int, y: int, w: int, h: int,
                  colour: Tuple[int, int, int]) -> None:
    """Filled ellipse inside the given box."""
    hh, ww = img.shape[:2]
    yy, xx = np.mgrid[0:hh, 0:ww]
    cx, cy = x + w / 2, y + h / 2
    mask = (((xx - cx) / max(w / 2, 1)) ** 2
            + ((yy - cy) / max(h / 2, 1)) ** 2) <= 1.0
    img[mask] = colour


def ellipse_polygon(x, y, w, h, label, points=12) -> PolygonAnnotation:
    """Polygon approximating the drawn ellipse (for mask training tests)."""
    cx, cy = x + w / 2, y + h / 2
    xs, ys = [], []
    for t in range(points):
        a = 2 * math.pi * t / points
        xs.append(cx + (w / 2) * math.cos(a))
        ys.append(cy + (h / 2) * math.sin(a))
    return PolygonAnnotation(xs, ys, label)


def make_project(
    root: str,
    num_images: int = 8,
    image_size: Tuple[int, int] = (160, 160),
    labels: List[str] = ("particle",),
    max_boxes: int = 3,
    seed: int = 0,
    polygons: bool = False,
    keypoints: bool = False,
) -> Project:
    """Write JPEGs under ``root`` and return a Project referencing them.

    With ``polygons=True`` annotations are PolygonAnnotations tracing the
    drawn ellipses (exercising the Mask R-CNN target path).  With
    ``keypoints=True`` each box carries 5 visible COCO-style keypoint
    triples — the ellipse centre and its 4 axis extremes (the Keypoint
    R-CNN target path).
    """
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    project = Project()
    h, w = image_size
    palette = [(230, 230, 240), (250, 160, 60), (90, 200, 250)]
    for i in range(num_images):
        img = rng.integers(10, 40, (h, w, 3)).astype(np.uint8)
        meta = ImageMetadata(f"img_{i:03d}.jpg", root, dataset_id=1,
                             frame_id=i)
        for _ in range(int(rng.integers(1, max_boxes + 1))):
            bw = int(rng.integers(24, 56))
            bh = int(rng.integers(24, 56))
            x = int(rng.integers(0, w - bw))
            y = int(rng.integers(0, h - bh))
            li = int(rng.integers(0, len(labels)))
            draw_particle(img, x, y, bw, bh, palette[li % len(palette)])
            if polygons:
                meta.add_annotation(ellipse_polygon(x, y, bw, bh, labels[li]))
            elif keypoints:
                cx, cy = x + bw / 2, y + bh / 2
                kps = [(cx, cy, 2.0),
                       (x + 1.0, cy, 2.0), (x + bw - 1.0, cy, 2.0),
                       (cx, y + 1.0, 2.0), (cx, y + bh - 1.0, 2.0)]
                meta.add_annotation(RectangleAnnotation(
                    x, y, bw, bh, labels[li], keypoints=kps))
            else:
                meta.add_annotation(
                    RectangleAnnotation(x, y, bw, bh, labels[li]))
        Image.fromarray(img).save(os.path.join(root, f"img_{i:03d}.jpg"),
                                  quality=92)
        project.add_image(meta)
    return project
