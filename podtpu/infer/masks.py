"""Host-side mask utilities: paste box-local masks, trace polygon contours.

The reference gets these for free from native deps — torchvision's
``paste_masks_in_image`` (used inside Mask R-CNN postprocess) and
pycocotools RLE for segm eval (`miso/object_detection/engine/coco_eval.py:110-114`).
Here both are small, vectorised numpy routines: the hot path (mask head
forward) already ran on the TPU; pasting/contouring touches only the final
detections per image, so host numpy is the right tier (same reasoning as the
reference keeping pycocotools on CPU).
"""
from __future__ import annotations

from typing import List

import numpy as np


def paste_mask(mask: np.ndarray, box: np.ndarray, out_h: int,
               out_w: int) -> np.ndarray:
    """Bilinearly resample a ``[M, M]`` box-local mask into an
    ``[out_h, out_w]`` canvas grid (float, 0 outside the box).

    ``box`` is xyxy in the OUTPUT grid's coordinate frame (torchvision's
    paste_masks_in_image semantics: the mask covers the box extent exactly,
    sampled at output-pixel centres).
    """
    out = np.zeros((out_h, out_w), np.float32)
    x0, y0, x1, y1 = [float(v) for v in box]
    if x1 <= x0 or y1 <= y0:
        return out
    m = mask.astype(np.float32)
    mh, mw = m.shape

    # Integer pixel range the box touches, clipped to the canvas.
    px0 = max(int(np.floor(x0)), 0)
    py0 = max(int(np.floor(y0)), 0)
    px1 = min(int(np.ceil(x1)), out_w)
    py1 = min(int(np.ceil(y1)), out_h)
    if px1 <= px0 or py1 <= py0:
        return out

    # Output pixel centres -> continuous mask coordinates in [0, mh/mw].
    ys = (np.arange(py0, py1, dtype=np.float32) + 0.5 - y0) \
        / (y1 - y0) * mh - 0.5
    xs = (np.arange(px0, px1, dtype=np.float32) + 0.5 - x0) \
        / (x1 - x0) * mw - 0.5

    y0i = np.clip(np.floor(ys).astype(np.int32), 0, mh - 1)
    x0i = np.clip(np.floor(xs).astype(np.int32), 0, mw - 1)
    y1i = np.clip(y0i + 1, 0, mh - 1)
    x1i = np.clip(x0i + 1, 0, mw - 1)
    wy = np.clip(ys - y0i, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0i, 0.0, 1.0)[None, :]

    patch = (m[np.ix_(y0i, x0i)] * (1 - wy) * (1 - wx)
             + m[np.ix_(y1i, x0i)] * wy * (1 - wx)
             + m[np.ix_(y0i, x1i)] * (1 - wy) * wx
             + m[np.ix_(y1i, x1i)] * wy * wx)
    # Zero contributions sampled outside the box interior.
    inside_y = (ys >= -0.5) & (ys <= mh - 0.5)
    inside_x = (xs >= -0.5) & (xs <= mw - 0.5)
    patch *= inside_y[:, None] * inside_x[None, :]
    out[py0:py1, px0:px1] = patch
    return out


def paste_masks(masks: np.ndarray, boxes: np.ndarray, out_h: int,
                out_w: int) -> np.ndarray:
    """``[N, M, M]`` masks + ``[N, 4]`` boxes -> ``[N, out_h, out_w]``."""
    return np.stack([paste_mask(m, b, out_h, out_w)
                     for m, b in zip(masks, boxes)]) \
        if len(masks) else np.zeros((0, out_h, out_w), np.float32)


def mask_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU between ``[N, H, W]`` and ``[M, H, W]`` boolean masks."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    af = a.reshape(len(a), -1).astype(np.float64)
    bf = b.reshape(len(b), -1).astype(np.float64)
    inter = af @ bf.T
    union = af.sum(1)[:, None] + bf.sum(1)[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


# -- contour tracing ----------------------------------------------------------

# Moore-neighbourhood offsets, clockwise starting from west.
_NEIGHBOURS = np.array([(0, -1), (-1, -1), (-1, 0), (-1, 1),
                        (0, 1), (1, 1), (1, 0), (1, -1)], np.int32)


def _trace_boundary(grid: np.ndarray, start: tuple) -> np.ndarray:
    """Moore-neighbour boundary trace of the connected component containing
    ``start`` (a boundary pixel).  Returns ``[P, 2]`` (x, y) pixel coords."""
    h, w = grid.shape

    def on(p):
        y, x = p
        return 0 <= y < h and 0 <= x < w and grid[y, x]

    contour = [start]
    # Backtrack direction: we entered `start` scanning left-to-right, so the
    # previous (off) pixel is to the west.
    prev_dir = 0
    cur = start
    first_move = None  # direction of the very first step out of `start`
    for _ in range(4 * h * w):  # hard bound
        found = False
        # Search clockwise starting just after the backtrack direction.
        for k in range(1, 9):
            d = (prev_dir + k) % 8
            cand = (cur[0] + _NEIGHBOURS[d][0], cur[1] + _NEIGHBOURS[d][1])
            if on(cand):
                found = True
                break
        if not found:  # isolated pixel
            break
        # Jacob's stopping criterion: the walk is closed when, standing on
        # the start pixel again, the next move repeats the initial move.
        # A plain `cur == start` test truncates components whose boundary
        # passes through the start pixel more than once (two lobes joined
        # diagonally at the start).
        if cur == start and first_move is not None and d == first_move:
            break
        if cur == start and first_move is None:
            first_move = d
        # Resume the clockwise search just after the off-pixel we came
        # from (Moore tracing: back up one step).
        prev_dir = (d + 5) % 8
        cur = cand
        contour.append(cur)
    # The closed walk re-appends `start` on its final re-entry.
    if len(contour) > 1 and contour[-1] == contour[0]:
        contour.pop()
    return np.array([(x, y) for y, x in contour], np.float32)


def mask_to_polygons(bitmap: np.ndarray, threshold: float = 0.5,
                     min_area: float = 4.0) -> List[np.ndarray]:
    """Extract outer-boundary polygons from a float/bool mask.

    Returns a list of ``[P, 2]`` (x, y) arrays, one per connected component
    with area >= ``min_area`` pixels, largest first.  Boundary pixels are
    reported at pixel centres.
    """
    grid = np.asarray(bitmap) > threshold
    if not grid.any():
        return []
    h, w = grid.shape
    labels = np.zeros((h, w), np.int32)
    polys: List[np.ndarray] = []
    areas: List[float] = []
    next_label = 0
    for y in range(h):
        row = grid[y]
        for x in np.flatnonzero(row):
            if labels[y, x]:
                continue
            # Flood-fill the component (BFS, vectorised per frontier row).
            next_label += 1
            comp = _flood(grid, labels, (y, x), next_label)
            if comp < min_area:
                continue
            polys.append(_trace_boundary(grid, (y, x)))
            areas.append(comp)
    order = np.argsort(areas)[::-1]
    return [polys[i] for i in order]


def _flood(grid: np.ndarray, labels: np.ndarray, start: tuple,
           label: int) -> int:
    h, w = grid.shape
    stack = [start]
    labels[start] = label
    count = 0
    while stack:
        y, x = stack.pop()
        count += 1
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                       (1, 1), (1, -1), (-1, 1), (-1, -1)):
            ny, nx = y + dy, x + dx
            if 0 <= ny < h and 0 <= nx < w and grid[ny, nx] \
                    and not labels[ny, nx]:
                labels[ny, nx] = label
                stack.append((ny, nx))
    return count
