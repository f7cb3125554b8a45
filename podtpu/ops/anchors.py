"""Multi-level anchor generation for FPN detectors.

TPU-native replacement for torchvision's ``AnchorGenerator`` used inside the
reference's ``fasterrcnn_resnet50_fpn`` (reference
`miso/object_detection/models.py:8-12`).  Because the rebuild uses a *static*
padded canvas, anchors are a compile-time constant: generated once per
(image_size, strides) configuration and baked into the jitted program.

Matches torchvision's semantics: cell anchors are zero-centred boxes of area
``size**2`` with the requested aspect ratios (rounded the same way), tiled at
``stride`` offsets from the image origin.
"""
from __future__ import annotations

import functools
import math
from typing import Sequence, Tuple

import numpy as np

# torchvision FasterRCNN defaults: one size per FPN level P2..P6, 3 ratios.
DEFAULT_SIZES = (32, 64, 128, 256, 512)
DEFAULT_RATIOS = (0.5, 1.0, 2.0)


def cell_anchors(size, aspect_ratios: Sequence[float]) -> np.ndarray:
    """Zero-centred anchors ``[A, 4]`` (xyxy) for one level.

    ``size`` may be a scalar (FPN convention: one size per level, A =
    len(ratios)) or a tuple of sizes (single-feature-map convention, e.g.
    the reference's MobileNetV2 detector with 5 sizes x 3 ratios per
    location, `miso/instance_segmentation/training.py:18-19`; A =
    len(sizes) * len(ratios)).  Ordering matches torchvision's
    ``AnchorGenerator``: ratio-major, size-minor.
    """
    sizes = np.atleast_1d(np.asarray(size, dtype=np.float32))
    ratios = np.asarray(aspect_ratios, dtype=np.float32)
    h_ratios = np.sqrt(ratios)
    w_ratios = 1.0 / h_ratios
    # Half-extents are rounded AFTER halving (torchvision AnchorGenerator
    # convention), so e.g. size 32 @ ratio 0.5 gives (+-23, +-11).
    hw = np.round(w_ratios[:, None] * sizes[None, :] / 2.0).reshape(-1)
    hh = np.round(h_ratios[:, None] * sizes[None, :] / 2.0).reshape(-1)
    return np.stack([-hw, -hh, hw, hh], axis=-1).astype(np.float32)


@functools.lru_cache(maxsize=32)
def grid_anchors(
    image_size: Tuple[int, int],
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64),
    sizes: Tuple[float, ...] = DEFAULT_SIZES,
    aspect_ratios: Tuple[float, ...] = DEFAULT_RATIOS,
) -> Tuple[np.ndarray, ...]:
    """Anchor grids for every FPN level.

    Returns a tuple of ``[Hl*Wl*A, 4]`` float32 arrays, one per level, where
    ``Hl = ceil(H / stride)`` etc.  Within a level, anchors are ordered
    location-major, anchor-minor (y, x, A) — the same flattening the RPN head
    uses for its logits, so the two line up index-for-index.
    """
    H, W = image_size
    out = []
    for stride, size in zip(strides, sizes):
        base = cell_anchors(size, aspect_ratios)  # [A, 4]
        hl = -(-H // stride)
        wl = -(-W // stride)
        shift_x = np.arange(wl, dtype=np.float32) * stride
        shift_y = np.arange(hl, dtype=np.float32) * stride
        sx, sy = np.meshgrid(shift_x, shift_y)  # [hl, wl]
        shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
        anchors = (shifts + base[None, :, :]).reshape(-1, 4)
        out.append(anchors.astype(np.float32))
    return tuple(out)


def num_anchors_per_location(aspect_ratios=DEFAULT_RATIOS,
                             sizes_per_level=1) -> int:
    return len(aspect_ratios) * sizes_per_level


@functools.lru_cache(maxsize=32)
def default_boxes(
    image_size: Tuple[int, int],
    feature_shapes: Tuple[Tuple[int, int], ...],
    scales: Tuple[float, ...],
    aspect_ratios: Tuple[Tuple[float, ...], ...],
    steps: Tuple[int, ...] = (),
    clip: bool = True,
) -> Tuple[np.ndarray, ...]:
    """SSD default boxes ("priors"), compile-time constants per level.

    TPU-native equivalent of torchvision's ``DefaultBoxGenerator`` (used by
    the ``ssd300_vgg16`` / ``ssdlite320_mobilenet_v3_large`` zoo models the
    reference's vendored trainer dispatches to,
    `miso/object_detection/engine/train.py:219-221`); semantics match it:

    * per level ``k`` the per-location (w, h) pairs are ``(s_k, s_k)``,
      ``(sqrt(s_k * s_{k+1}),) * 2`` and, for every aspect ratio ``a``,
      ``(s_k * sqrt(a), s_k / sqrt(a))`` plus its transpose — so
      ``A_k = 2 + 2 * len(aspect_ratios[k])``;
    * centres sit at ``(i + 0.5) / f_k`` in normalised coords, where
      ``f_k`` is the grid size, or ``image_size / steps[k]`` when explicit
      ``steps`` are given (the ssd300 recipe's fractional grids);
    * with ``clip`` the normalised (w, h) are clamped to [0, 1] before
      scaling to pixels (boxes may still hang over the border — parity).

    Returns one ``[Hk*Wk*A_k, 4]`` float32 xyxy array per level, ordered
    location-major, anchor-minor (matching the head's NHWC flattening).
    ``scales`` has ``len(feature_shapes) + 1`` entries (the extra one feeds
    the last level's geometric-mean box).
    """
    H, W = image_size
    out = []
    for k, (fh, fw) in enumerate(feature_shapes):
        s_k = scales[k]
        s_prime = math.sqrt(scales[k] * scales[k + 1])
        pairs = [(s_k, s_k), (s_prime, s_prime)]
        for ar in aspect_ratios[k]:
            sq = math.sqrt(ar)
            pairs.append((s_k * sq, s_k / sq))
            pairs.append((s_k / sq, s_k * sq))
        wh = np.asarray(pairs, dtype=np.float32)  # [A, 2] normalised
        if clip:
            wh = np.clip(wh, 0.0, 1.0)
        if steps:
            y_f, x_f = H / steps[k], W / steps[k]
        else:
            y_f, x_f = float(fh), float(fw)
        cx = (np.arange(fw, dtype=np.float32) + 0.5) / x_f
        cy = (np.arange(fh, dtype=np.float32) + 0.5) / y_f
        sx, sy = np.meshgrid(cx, cy)  # [fh, fw]
        centers = np.stack([sx, sy], axis=-1).reshape(-1, 1, 2)  # [HW, 1, 2]
        wh_b = wh[None, :, :]  # [1, A, 2]
        x1y1 = centers - 0.5 * wh_b
        x2y2 = centers + 0.5 * wh_b
        boxes = np.concatenate([x1y1, x2y2], axis=-1).reshape(-1, 4)
        # Scale normalised coords to pixels: x by W, y by H.
        boxes *= np.asarray([W, H, W, H], dtype=np.float32)
        out.append(boxes.astype(np.float32))
    return tuple(out)
