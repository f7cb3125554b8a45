"""Tiled sliding-window inference with cross-tile NMS.

New first-class capability (SURVEY.md §5 "long-context"): the reference has
no tiled inference — detections are whole-image, and its README notes batch
size is limited by memory for large micrographs (`README.md:153`).  Here,
arbitrarily large scans are processed as overlapping canvas-sized tiles
batched through the SAME static-shape jitted forward pass (no recompiles,
tiles fill the batch dimension), then merged:

* tiles overlap by a configurable fraction so objects split by a tile
  boundary are seen whole in a neighbouring tile;
* per-tile detections are shifted into scan coordinates;
* duplicates from overlap zones are removed by class-aware greedy NMS on the
  thresholded survivors (host-side: counts are tiny after thresholding).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple, Union

import numpy as np
from PIL import Image

from podtpu.infer.inference import load_inference_model
from podtpu.data.imageio import pil_to_rgb
from podtpu.train.step import split_eval_output


@dataclass
class TiledDetection:
    box: Tuple[float, float, float, float]  # xyxy in scan coordinates
    score: float
    label: int  # 1-based model label index
    # Mask models only: [P, 2] (x, y) polygon outline in scan coordinates
    # (largest connected component of the predicted instance mask).
    polygon: "np.ndarray" = None


def tile_origins(size: int, tile: int, stride: int) -> List[int]:
    """Start offsets covering ``size`` with ``tile``-sized windows."""
    if size <= tile:
        return [0]
    xs = list(range(0, size - tile, stride))
    xs.append(size - tile)  # final tile flush with the edge
    return xs


def greedy_nms(boxes: np.ndarray, scores: np.ndarray,
               iou_threshold: float) -> np.ndarray:
    """Host-side greedy NMS, vectorised: each kept box suppresses its
    overlaps with one O(N) vector pass, so total cost is
    O(num_kept * N) numpy ops — dense scans with thousands of detections
    merge in milliseconds (the round-1 pure-Python double loop was O(N^2)
    scalar ops)."""
    n = len(boxes)
    if n == 0:
        return np.zeros((0,), np.int64)
    order = np.argsort(-scores, kind="stable")
    b = boxes[order].astype(np.float32)
    areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    alive = np.ones(n, bool)
    keep: List[int] = []
    for i in range(n):
        if not alive[i]:
            continue
        keep.append(int(order[i]))
        if i + 1 == n:
            break
        rest = b[i + 1:]
        x1 = np.maximum(b[i, 0], rest[:, 0])
        y1 = np.maximum(b[i, 1], rest[:, 1])
        x2 = np.minimum(b[i, 2], rest[:, 2])
        y2 = np.minimum(b[i, 3], rest[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        union = areas[i] + areas[i + 1:] - inter
        iou = np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)
        alive[i + 1:] &= iou <= iou_threshold
    return np.asarray(keep, np.int64)


def cross_tile_nms(detections: Sequence[TiledDetection],
                   iou_threshold: float = 0.5) -> List[TiledDetection]:
    """Class-aware NMS across tile boundaries."""
    if not detections:
        return []
    boxes = np.asarray([d.box for d in detections], np.float64)
    scores = np.asarray([d.score for d in detections])
    labels = np.asarray([d.label for d in detections])
    out: List[TiledDetection] = []
    for cls in np.unique(labels):
        sel = np.flatnonzero(labels == cls)
        keep = greedy_nms(boxes[sel], scores[sel], iou_threshold)
        out.extend(detections[int(sel[k])] for k in keep)
    out.sort(key=lambda d: -d.score)
    return out


def infer_tiled(
    image: Union[str, np.ndarray],
    model_path: str,
    threshold: float = 0.5,
    overlap: float = 0.25,
    batch_size: int = 8,
    nms_threshold: float = 0.5,
    tile_size: int = None,
    spatial_devices: int = 1,
) -> List[TiledDetection]:
    """Detect objects in an arbitrarily large scan image.

    ``image``: path or ``[H, W, 3]`` uint8/float array.

    ``tile_size``: override the tile canvas (the detector's parameters are
    canvas-independent — anchors regenerate for the new size).  Combined
    with ``spatial_devices=N``, each giant tile's height is sharded over N
    devices (`podtpu/parallel/spatial.py`), so a tile can exceed one
    chip's activation memory — e.g. 4096² windows on an 8-chip mesh.
    """
    from pathlib import Path
    model_dir = str(Path(model_path).parent) if Path(model_path).suffix \
        else str(model_path)
    eval_step, params, frozen, cfg, _labels = load_inference_model(model_dir)
    if tile_size is not None and (tile_size, tile_size) != cfg.image_size:
        import dataclasses

        from podtpu.models.detector import make_detector
        from podtpu.train.step import make_eval_step
        cfg = dataclasses.replace(cfg, image_size=(tile_size, tile_size))
        eval_step = make_eval_step(make_detector(cfg))
    if spatial_devices > 1:
        import jax

        from podtpu.models.detector import make_detector
        from podtpu.parallel.spatial import (make_spatial_eval_step,
                                             spatial_mesh)
        mesh = spatial_mesh(jax.devices()[:spatial_devices])
        eval_step = make_spatial_eval_step(make_detector(cfg), mesh)
    th, tw = cfg.image_size
    assert th == tw, "tiled inference assumes a square canvas"
    tile = th
    stride = max(1, int(round(tile * (1.0 - overlap))))

    if isinstance(image, str):
        with Image.open(image) as im:
            arr = pil_to_rgb(im)
    else:
        arr = np.asarray(image)
        if arr.dtype != np.uint8 and np.issubdtype(arr.dtype, np.integer):
            # Normalise non-uint8 integer inputs (e.g. uint16 TIFF
            # micrographs) by their dtype range — the device normaliser
            # only rescales uint8.
            arr = (arr.astype(np.float32)
                   / float(np.iinfo(arr.dtype).max))
        elif arr.dtype != np.uint8:
            arr = arr.astype(np.float32)
    # uint8 tiles ship as-is (4x less transfer); the eval step normalises
    # on device.  Float inputs are assumed already in [0, 1].
    h, w = arr.shape[:2]

    origins = [(y, x) for y in tile_origins(h, tile, stride)
               for x in tile_origins(w, tile, stride)]

    detections: List[TiledDetection] = []
    for start in range(0, len(origins), batch_size):
        chunk = origins[start: start + batch_size]
        batch = np.zeros((batch_size, tile, tile, 3), arr.dtype)
        extents = []
        for bi, (y, x) in enumerate(chunk):
            sub = arr[y: y + tile, x: x + tile]
            batch[bi, : sub.shape[0], : sub.shape[1]] = sub
            extents.append((sub.shape[0], sub.shape[1]))
        result = eval_step(params, frozen, batch)
        det, out_masks, _ = split_eval_output(result)
        masks = np.asarray(out_masks) if out_masks is not None else None
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        for bi, (y, x) in enumerate(chunk):
            keep = valid[bi] & (scores[bi] > threshold)
            # Drop detections whose centre falls in the zero-padded region
            # of an edge tile (phantom objects hallucinated on the pad).
            sh, sw = extents[bi]
            cx = (boxes[bi][:, 0] + boxes[bi][:, 2]) / 2
            cy = (boxes[bi][:, 1] + boxes[bi][:, 3]) / 2
            keep &= (cx < sw) & (cy < sh)
            kept_idx = np.flatnonzero(keep)
            for j in kept_idx:
                b, s, l = boxes[bi][j], scores[bi][j], labels[bi][j]
                poly = None
                if masks is not None:
                    # Box-local mask -> polygon in tile coords, then shift
                    # into scan coords (same trace as infer()'s CVAT
                    # export, podtpu/infer/inference.py).
                    from podtpu.infer.inference import _mask_to_annotation
                    ann = _mask_to_annotation(masks[bi][j], b, "", float(s))
                    if ann is not None:
                        poly = np.stack([np.asarray(ann.xs) + x,
                                         np.asarray(ann.ys) + y], axis=1)
                detections.append(TiledDetection(
                    box=(float(b[0] + x), float(b[1] + y),
                         float(b[2] + x), float(b[3] + y)),
                    score=float(s), label=int(l), polygon=poly))
    return cross_tile_nms(detections, nms_threshold)
