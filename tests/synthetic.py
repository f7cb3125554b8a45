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


HARD_CLASSES = ("ellipse", "ring", "slab", "cross", "wedge")


def _shape_mask(shape: str, bw: int, bh: int, angle: float,
                rng: np.random.Generator) -> np.ndarray:
    """Boolean [bh, bw] mask of the shape, rotated by ``angle`` radians.

    Classes differ by GEOMETRY only (colour is randomised per instance),
    so telling them apart requires learning shape, not a palette lookup.
    """
    yy, xx = np.mgrid[0:bh, 0:bw]
    cx, cy = (bw - 1) / 2, (bh - 1) / 2
    ca, sa = math.cos(angle), math.sin(angle)
    # Rotated, normalised local frame (u along width, v along height).
    u = ((xx - cx) * ca + (yy - cy) * sa) / max(bw / 2, 1)
    v = (-(xx - cx) * sa + (yy - cy) * ca) / max(bh / 2, 1)
    if shape == "ellipse":
        return u ** 2 + v ** 2 <= 1.0
    if shape == "ring":
        r2 = u ** 2 + v ** 2
        inner = rng.uniform(0.35, 0.55)
        return (r2 <= 1.0) & (r2 >= inner ** 2)
    if shape == "slab":
        # Thin filled rectangle: full length, 25-45% thickness.
        t = rng.uniform(0.25, 0.45)
        return (np.abs(u) <= 1.0) & (np.abs(v) <= t)
    if shape == "cross":
        t = rng.uniform(0.2, 0.35)
        return ((np.abs(u) <= t) & (np.abs(v) <= 1.0)) | \
               ((np.abs(v) <= t) & (np.abs(u) <= 1.0))
    if shape == "wedge":
        # Triangle: apex at the top of the local frame, base at the bottom.
        return (v >= -1.0) & (v <= 1.0) & (np.abs(u) <= (v + 1.0) / 2)
    raise ValueError(shape)


def _mask_bounds(mask: np.ndarray) -> Tuple[int, int, int, int]:
    ys, xs = np.nonzero(mask)
    return int(xs.min()), int(ys.min()), int(xs.max()), int(ys.max())


def make_hard_project(
    root: str,
    num_images: int = 200,
    image_size: Tuple[int, int] = (1024, 1024),
    max_boxes: int = 24,
    seed: int = 0,
) -> Project:
    """A deliberately harder benchmark task than :func:`make_project`.

    - 5 classes distinguished by shape alone (random per-instance colour)
    - wide scale range (18-170 px → exercises all FPN levels)
    - random rotation per instance
    - moderate occlusion: SAMPLED placements are rejected above pairwise
      IoU 0.35; the emitted annotations are then tightened to the drawn
      support (rotation shrinks it), so final-box IoU can run somewhat
      higher (~0.55 observed worst case)
    - unannotated distractor speckles + uneven background illumination
    """
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    project = Project()
    h, w = image_size
    for i in range(num_images):
        # Uneven illumination: dark noise + a smooth gradient.
        base = rng.integers(8, 30, (h, w, 3)).astype(np.float32)
        gy = rng.uniform(-25, 25)
        gx = rng.uniform(-25, 25)
        ramp = (np.linspace(0, 1, h)[:, None] * gy
                + np.linspace(0, 1, w)[None, :] * gx)
        img = np.clip(base + ramp[..., None] + 25, 0, 255).astype(np.uint8)

        # Unannotated distractors: tiny dim speckles (below the 18 px
        # annotated minimum and much darker than real particles).
        for _ in range(int(rng.integers(10, 30))):
            sw = int(rng.integers(3, 9))
            sx = int(rng.integers(0, w - sw))
            sy = int(rng.integers(0, h - sw))
            spot = _shape_mask("ellipse", sw, sw, 0.0, rng)
            region = img[sy:sy + sw, sx:sx + sw]
            region[spot] = np.minimum(region[spot] + 35, 90)

        meta = ImageMetadata(f"hard_{i:04d}.jpg", root, dataset_id=1,
                             frame_id=i)
        placed: List[Tuple[int, int, int, int]] = []
        target = int(rng.integers(max(3, max_boxes // 3), max_boxes + 1))
        attempts = 0
        while len(placed) < target and attempts < target * 12:
            attempts += 1
            size = int(np.exp(rng.uniform(np.log(18), np.log(170))))
            ar = rng.uniform(0.5, 2.0)
            bw = max(12, min(int(size * math.sqrt(ar)), w - 2))
            bh = max(12, min(int(size / math.sqrt(ar)), h - 2))
            x = int(rng.integers(0, w - bw))
            y = int(rng.integers(0, h - bh))
            # Reject heavy overlap (allow moderate occlusion).
            ok = True
            for (px, py, pw, ph) in placed:
                ix = max(0, min(x + bw, px + pw) - max(x, px))
                iy = max(0, min(y + bh, py + ph) - max(y, py))
                inter = ix * iy
                union = bw * bh + pw * ph - inter
                if inter / union > 0.35:
                    ok = False
                    break
            if not ok:
                continue
            li = int(rng.integers(0, len(HARD_CLASSES)))
            angle = rng.uniform(0, math.pi)
            mask = _shape_mask(HARD_CLASSES[li], bw, bh, angle, rng)
            if not mask.any():
                continue
            # Random bright-ish colour, uncorrelated with the class.
            colour = rng.integers(110, 255, 3)
            region = img[y:y + bh, x:x + bw]
            region[mask] = (0.85 * colour
                            + 0.15 * region[mask]).astype(np.uint8)
            # Tight box around the ACTUAL drawn pixels (rotation shrinks
            # the support inside the sampled box).
            x0, y0, x1, y1 = _mask_bounds(mask)
            meta.add_annotation(RectangleAnnotation(
                x + x0, y + y0, x1 - x0 + 1, y1 - y0 + 1,
                HARD_CLASSES[li]))
            placed.append((x + x0, y + y0, x1 - x0 + 1, y1 - y0 + 1))
        Image.fromarray(img).save(os.path.join(root, f"hard_{i:04d}.jpg"),
                                  quality=92)
        project.add_image(meta)
    return project


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
