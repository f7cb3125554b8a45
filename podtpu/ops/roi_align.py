"""RoIAlign over FPN levels, TPU-style.

TPU-native replacement for torchvision's CUDA/C++ ``roi_align`` /
``MultiScaleRoIAlign`` used inside the reference's model
(reference `miso/object_detection/models.py:8-12`,
`miso/instance_segmentation/training.py:28-30`; SURVEY.md §2.2).

Design (static shapes, single pass over all FPN levels):

* All level feature maps (NHWC) are flattened and concatenated into one
  ``[sum(Hl*Wl), C]`` table per image.  Per-level geometry (offset, W, H,
  stride) lives in tiny constant arrays indexed by each RoI's assigned level.
* Each RoI is assigned an FPN level with the FPN paper heuristic
  (``k = floor(k0 + log2(sqrt(area)/224))`` clamped to the level range) —
  identical to torchvision's ``LevelMapper``.
* Bilinear sampling follows the torchvision ``roi_align`` kernel semantics
  exactly (aligned=False legacy mode by default): sample points outside
  ``[-1, size]`` contribute zero; coordinates clamp at the borders.
* Every sample point becomes 4 gathers from the flat table + a weighted sum;
  RoIs are processed in chunks via ``lax.map`` to bound the gather
  intermediate.  Fixed RoI count, fixed ``output_size``, fixed
  ``sampling_ratio`` — no data-dependent shapes anywhere.

A Pallas kernel (podtpu/ops/pallas/roi_align_kernel.py) implements the same
contract with explicit VMEM windows; this module is the XLA reference and the
fallback path.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def flatten_levels(features: Sequence[jnp.ndarray]):
    """Concatenate per-level NHWC feature maps into a flat per-image table.

    Args:
      features: list of ``[B, Hl, Wl, C]`` arrays (one per FPN level).
    Returns:
      flat: ``[B, sum(Hl*Wl), C]`` array.
      geom: dict of int32 arrays ``offset``, ``height``, ``width`` per level.
    """
    b = features[0].shape[0]
    c = features[0].shape[-1]
    flats, offsets, heights, widths = [], [], [], []
    off = 0
    for f in features:
        _, h, w, _ = f.shape
        flats.append(f.reshape(b, h * w, c))
        offsets.append(off)
        heights.append(h)
        widths.append(w)
        off += h * w
    geom = {
        "offset": jnp.asarray(offsets, jnp.int32),
        "height": jnp.asarray(heights, jnp.int32),
        "width": jnp.asarray(widths, jnp.int32),
    }
    return jnp.concatenate(flats, axis=1), geom


def assign_levels(
    boxes: jnp.ndarray,
    num_levels: int,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    min_level: int = 2,
    eps: float = 1e-6,
    max_span_cells: float = 30.0,
    base_stride: float = 4.0,
) -> jnp.ndarray:
    """FPN level index (0-based into the feature list) for each ``[K,4]`` box.

    Matches torchvision's ``LevelMapper`` (``k = floor(k0 +
    log2(sqrt(area)/s0))`` clamped to the level range) with ONE deliberate
    deviation: a box whose LONG side would span more than
    ``max_span_cells`` feature cells at its canonical level (elongated or
    near-canvas boxes — sqrt-area assignment ignores aspect ratio) is
    bumped to the coarsest level where it fits.  Torchvision would sample
    such a box fine; the Pallas kernel's fixed VMEM window cannot hold it
    and would otherwise CLAMP sample points (silently wrong features).
    Both the XLA and Pallas paths apply the bump so backends agree
    bit-for-bit.  Pass ``max_span_cells=None`` for strict torchvision
    assignment.
    """
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    area = jnp.clip(w * h, 0.0)
    scale = jnp.sqrt(area)
    lvl = jnp.floor(canonical_level + jnp.log2(scale / canonical_scale + eps))
    if max_span_cells is not None:
        long_px = jnp.maximum(jnp.maximum(w, h), eps)
        # Smallest level whose stride keeps the span within the window.
        need = jnp.ceil(
            jnp.log2(long_px / (max_span_cells * base_stride) + eps))
        lvl = jnp.maximum(lvl, min_level + need)
    lvl = jnp.clip(lvl, min_level, min_level + num_levels - 1)
    return (lvl - min_level).astype(jnp.int32)


def _interp_axis(coord, size):
    """Bilinear neighbours + weights along one axis, torchvision semantics.

    Args:
      coord: ``[...]`` sample coordinates (already in feature units).
      size: ``[...]`` int32 axis length (broadcastable).
    Returns:
      (lo, hi, w_lo, w_hi, inside): integer neighbours, their weights, and
      whether the sample point is inside ``[-1, size]`` at all.
    """
    sizef = size.astype(coord.dtype)
    inside = (coord >= -1.0) & (coord <= sizef)
    c = jnp.clip(coord, 0.0, sizef - 1.0)
    lo = jnp.floor(c)
    # When lo lands on the last cell, collapse to it (frac becomes 0).
    lo = jnp.minimum(lo, jnp.maximum(sizef - 2.0, 0.0))
    frac = c - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, size - 1)
    return lo_i, hi_i, 1.0 - frac, frac, inside


def multilevel_roi_align(
    flat: jnp.ndarray,
    geom: dict,
    boxes: jnp.ndarray,
    strides: Sequence[int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = False,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    min_level: int = 2,
    roi_chunk: int = 64,
) -> jnp.ndarray:
    """RoIAlign of ``[K, 4]`` xyxy boxes (image coords) over flattened levels.

    Args:
      flat: ``[L_total, C]`` flat feature table for ONE image
        (vmap over the batch dimension for batched use).
      geom: per-level geometry from :func:`flatten_levels` (batch-invariant).
      boxes: ``[K, 4]`` RoIs in image pixel coordinates.
      strides: per-level strides (image px per feature cell), e.g. (4,8,16,32).
    Returns:
      ``[K, output_size, output_size, C]`` pooled features.
    """
    num_levels = len(strides)
    strides_arr = jnp.asarray(strides, jnp.float32)
    level = assign_levels(boxes, num_levels, canonical_scale, canonical_level,
                          min_level, base_stride=float(strides[0]))

    out = output_size
    s = sampling_ratio
    n_samp = out * s
    # Per-sample fractional offsets within the RoI, in bin units.
    grid = (np.arange(n_samp, dtype=np.float32) // s
            + ((np.arange(n_samp, dtype=np.float32) % s) + 0.5) / s)
    grid = jnp.asarray(grid)  # [out*s], value = bin_idx + sub-sample offset

    def one_roi(args):
        box, lvl = args
        scale = 1.0 / strides_arr[lvl]
        off = geom["offset"][lvl]
        hgt = geom["height"][lvl]
        wid = geom["width"][lvl]

        shift = 0.5 if aligned else 0.0
        x1 = box[0] * scale - shift
        y1 = box[1] * scale - shift
        x2 = box[2] * scale - shift
        y2 = box[3] * scale - shift
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        bin_w = roi_w / out
        bin_h = roi_h / out

        ys = y1 + grid * bin_h  # [n_samp]
        xs = x1 + grid * bin_w
        ylo, yhi, wy_lo, wy_hi, y_in = _interp_axis(ys, hgt)
        xlo, xhi, wx_lo, wx_hi, x_in = _interp_axis(xs, wid)

        # Row indices into the flat table for the 4 neighbours of each
        # (y, x) sample pair: [n_samp, n_samp] each.
        def rows(yi, xi):
            return off + yi[:, None] * wid + xi[None, :]

        v00 = flat[rows(ylo, xlo)]
        v01 = flat[rows(ylo, xhi)]
        v10 = flat[rows(yhi, xlo)]
        v11 = flat[rows(yhi, xhi)]
        wy_lo_, wy_hi_ = wy_lo[:, None, None], wy_hi[:, None, None]
        wx_lo_, wx_hi_ = wx_lo[None, :, None], wx_hi[None, :, None]
        val = (v00 * wy_lo_ * wx_lo_ + v01 * wy_lo_ * wx_hi_
               + v10 * wy_hi_ * wx_lo_ + v11 * wy_hi_ * wx_hi_)
        val = val * (y_in[:, None, None] & x_in[None, :, None])
        # Average the s x s sample points per output bin.
        c = val.shape[-1]
        val = val.reshape(out, s, out, s, c)
        return val.mean(axis=(1, 3))

    k = boxes.shape[0]
    if k > roi_chunk:
        # Chunk RoIs to bound the gather intermediate (lax.map is a scan:
        # one chunk's gathers live at a time).  Pad to a chunk multiple —
        # the old divisibility requirement silently fell through to the
        # full vmap (e.g. the 1000-proposal eval pool on the 1280-channel
        # single-map backbone materialised [K, out*s, out*s, C] for ALL
        # RoIs at once: 3.7 GB/image, an HBM OOM at batch 4).
        pad = (-k) % roi_chunk
        pboxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        plevel = jnp.pad(level, (0, pad))
        chunks = (pboxes.reshape(-1, roi_chunk, 4),
                  plevel.reshape(-1, roi_chunk))
        result = jax.lax.map(
            lambda a: jax.vmap(one_roi)((a[0], a[1])), chunks)
        return result.reshape(k + pad, out, out, flat.shape[-1])[:k]
    return jax.vmap(one_roi)((boxes, level))
