"""Box geometry primitives (pure jnp, XLA-fused).

TPU-native replacement for torchvision's C++/CUDA ``box_iou``/box-coder ops
that the reference inherits inside ``fasterrcnn_resnet50_fpn``
(reference `miso/object_detection/models.py:8-12`; see SURVEY.md §2.2).

Conventions:
  * boxes are ``[..., 4]`` float arrays in ``(x1, y1, x2, y2)`` corner format;
  * functions are shape-polymorphic, differentiable, vmappable;
  * "no box" slots are encoded by a caller-side validity mask, never by
    dynamic shapes.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp

# torchvision GeneralizedRCNN clips predicted log-size deltas at log(1000/16).
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of ``[..., 4]`` xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between ``[N, 4]`` and ``[M, 4]`` xyxy boxes → ``[N, M]``.

    Written componentwise on purpose: stacking the lt/rb pairs as
    ``[N, M, 2]`` made XLA materialise an extra [N, M, 2] tensor on the
    anchor-matching hot path (838 MB at 262k anchors x 100 gt) — separate
    x/y overlap terms keep every intermediate at [N, M] and fuse into the
    final product.
    """
    ix = (jnp.minimum(a[:, None, 2], b[None, :, 2])
          - jnp.maximum(a[:, None, 0], b[None, :, 0]))
    iy = (jnp.minimum(a[:, None, 3], b[None, :, 3])
          - jnp.maximum(a[:, None, 1], b[None, :, 1]))
    inter = jnp.clip(ix, 0.0) * jnp.clip(iy, 0.0)
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def box_center_size(boxes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                 jnp.ndarray, jnp.ndarray]:
    """Decompose xyxy boxes into (cx, cy, w, h)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return cx, cy, w, h


def encode_boxes(reference: jnp.ndarray, proposals: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """Encode ``reference`` (target gt) boxes relative to ``proposals``
    (anchors) as (dx, dy, dw, dh) regression targets.

    Matches the Faster R-CNN box coder semantics used throughout
    torchvision's GeneralizedRCNN (weights (1,1,1,1) in the RPN,
    (10,10,5,5) in the RoI heads).
    """
    wx, wy, ww, wh = weights
    pcx, pcy, pw, ph = box_center_size(proposals)
    gcx, gcy, gw, gh = box_center_size(reference)
    # Guard against degenerate proposals (validity-masked slots).
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    dx = wx * (gcx - pcx) / pw
    dy = wy * (gcy - pcy) / ph
    dw = ww * jnp.log(jnp.maximum(gw, 1e-6) / pw)
    dh = wh * jnp.log(jnp.maximum(gh, 1e-6) / ph)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(codes: jnp.ndarray, anchors: jnp.ndarray,
                 weights=(1.0, 1.0, 1.0, 1.0),
                 clip: float = BBOX_XFORM_CLIP) -> jnp.ndarray:
    """Invert :func:`encode_boxes`: apply (dx, dy, dw, dh) deltas to anchors."""
    wx, wy, ww, wh = weights
    acx, acy, aw, ah = box_center_size(anchors)
    dx = codes[..., 0] / wx
    dy = codes[..., 1] / wy
    dw = jnp.minimum(codes[..., 2] / ww, clip)
    dh = jnp.minimum(codes[..., 3] / wh, clip)
    cx = dx * aw + acx
    cy = dy * ah + acy
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def encode_boxes_linear(anchors: jnp.ndarray, boxes: jnp.ndarray,
                        normalize_by_size: bool = True) -> jnp.ndarray:
    """Linear (distance) box coder: targets are the (l, t, r, b) distances
    from the anchor CENTRE to the four sides of ``boxes``, optionally
    normalised by the anchor width/height.

    Matches torchvision's ``BoxLinearCoder(normalize_by_size=True)`` — the
    coder of the anchor-free FCOS family, where "anchors" are the
    stride-sized cell boxes whose centres are the feature-grid points.
    Paired (elementwise) semantics: ``anchors`` and ``boxes`` broadcast
    against each other on the leading axes.
    """
    acx, acy, aw, ah = box_center_size(anchors)
    l = acx - boxes[..., 0]
    t = acy - boxes[..., 1]
    r = boxes[..., 2] - acx
    b = boxes[..., 3] - acy
    codes = jnp.stack([l, t, r, b], axis=-1)
    if normalize_by_size:
        size = jnp.stack([aw, ah, aw, ah], axis=-1)
        codes = codes / jnp.maximum(size, 1e-6)
    return codes


def decode_boxes_linear(codes: jnp.ndarray, anchors: jnp.ndarray,
                        normalize_by_size: bool = True) -> jnp.ndarray:
    """Invert :func:`encode_boxes_linear`: (l, t, r, b) distances from the
    anchor centre back to xyxy corners."""
    acx, acy, aw, ah = box_center_size(anchors)
    if normalize_by_size:
        size = jnp.stack([aw, ah, aw, ah], axis=-1)
        codes = codes * size
    return jnp.stack([acx - codes[..., 0], acy - codes[..., 1],
                      acx + codes[..., 2], acy + codes[..., 3]], axis=-1)


def elementwise_giou(a: jnp.ndarray, b: jnp.ndarray,
                     eps: float = 1e-7) -> jnp.ndarray:
    """Paired generalised IoU between ``[..., 4]`` xyxy boxes → ``[...]``.

    Matches torchvision's ``generalized_box_iou_loss`` value (the loss is
    ``1 - giou``).  ``eps``-guarded divisions keep the value AND gradient
    finite on degenerate (zero-area) boxes — loss call sites mask invalid
    slots by multiplication, which does not stop NaN propagation.
    """
    ix = (jnp.minimum(a[..., 2], b[..., 2])
          - jnp.maximum(a[..., 0], b[..., 0]))
    iy = (jnp.minimum(a[..., 3], b[..., 3])
          - jnp.maximum(a[..., 1], b[..., 1]))
    inter = jnp.clip(ix, 0.0) * jnp.clip(iy, 0.0)
    union = box_area(a) + box_area(b) - inter
    iou = inter / (union + eps)
    # Smallest enclosing box.
    ex = (jnp.maximum(a[..., 2], b[..., 2])
          - jnp.minimum(a[..., 0], b[..., 0]))
    ey = (jnp.maximum(a[..., 3], b[..., 3])
          - jnp.minimum(a[..., 1], b[..., 1]))
    enclose = ex * ey
    return iou - (enclose - union) / (enclose + eps)


def clip_boxes(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    """Clip xyxy boxes to ``[0, W] x [0, H]``. ``image_size`` is (H, W)."""
    h, w = image_size
    x1 = jnp.clip(boxes[..., 0], 0.0, w)
    y1 = jnp.clip(boxes[..., 1], 0.0, h)
    x2 = jnp.clip(boxes[..., 2], 0.0, w)
    y2 = jnp.clip(boxes[..., 3], 0.0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes whose width AND height are >= ``min_size``.

    Static-shape stand-in for torchvision's ``remove_small_boxes``: callers
    AND this into their validity mask instead of filtering.
    """
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w >= min_size) & (h >= min_size)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x, y, w, h) top-left+size → corners. (The data model's `bounds`.)"""
    x, y, w, h = (boxes[..., i] for i in range(4))
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """Corners → (x, y, w, h) top-left+size (COCO result format)."""
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
