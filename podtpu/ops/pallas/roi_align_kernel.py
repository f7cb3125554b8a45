"""Pallas TPU RoIAlign kernels (forward + backward), native-layout windows.

Replaces the XLA point-gather formulation of :mod:`podtpu.ops.roi_align`
on the hot path (torchvision's CUDA ``roi_align``; SURVEY.md §2.2).
Design:

* levels stay in their native conv-output layout ``[B, H, W, C]`` — each
  RoI's window is ONE rank-3 strided DMA (y rows x x cells x full C).  The
  round-1 kernel flattened levels to ``[B, H, W*C]`` first, which forced a
  full re-tile copy of every pyramid level (and of the f32 gradient
  buffers) every step: ~10 ms/step of pure layout glue at 1024²/b4;
* bilinear interpolation is separable AND the ratio-mean pooling folds into
  the interpolation weights (mean of separable products = product of
  averaged weights), so each RoI is exactly two small ``dot_general``s with
  no transposes;
* window origins CLAMP at the feature edges instead of padding the level
  (shifting a window left/up only grows coverage); only levels smaller
  than the window itself get padded (P5 at 1024² canvas);
* the backward kernel runs the transposed contractions and accumulates
  window gradients with read-modify-write DMAs, parity-pipelined: even/odd
  RoIs write two separate buffer sets (summed by the caller) so a window
  read never races the previous RoI's write;
* grid = (batch, roi); per-RoI level selection is predicated DMAs
  (``@pl.when(level == l)``), only one of which fires.

Semantics match torchvision ``roi_align`` (aligned=False) with the shared
level-bump deviation for oversized RoIs (see ops/roi_align.assign_levels).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from podtpu.ops.roi_align import assign_levels

DEFAULT_WIN = 32

# TPU tiling on [B, H, W, C]: W is the sublane dim (8), C the lane dim
# (128).  Window x-origins must be 8-aligned; y-origins are unconstrained.
SUB_ALIGN = 8


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def window_dims(win: int):
    """(win_h, win_w): window extent including margins (y: +1 bilinear
    neighbour, x: 8-alignment + neighbour)."""
    return win + 1, win + SUB_ALIGN


def pad_levels(features: Sequence[jnp.ndarray], win: int = DEFAULT_WIN):
    """Pad only the levels SMALLER than the DMA window (origin clamping
    handles edges on large levels — no copies for P2..P4 at real canvases).
    Returns (padded [B, Hp, Wp, C] list, (h, w) dims per level)."""
    win_h, win_w = window_dims(win)
    padded, dims = [], []
    for f in features:
        b, h, w, c = f.shape
        hp, wp = max(h, win_h), max(w, win_w)
        if (hp, wp) != (h, w):
            f = jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        padded.append(f)
        dims.append((h, w))
    return padded, tuple(dims)


def _roi_params(boxes, strides, dims, output_size, aligned,
                canonical_scale, canonical_level, min_level, win):
    """Per-RoI kernel parameters.

    boxes: [B, K, 4].  Returns int_params [B, K, 4] (level, y0, x0, unused)
    and f32_params [B, K, 8] (y1, x1, bin_h, bin_w, y0f, x0f, hf, wf).
    Origins index into the (possibly padded) level arrays.
    """
    num_levels = len(strides)
    win_h, win_w = window_dims(win)
    heights = jnp.asarray([max(d[0], win_h) for d in dims], jnp.float32)
    widths = jnp.asarray([max(d[1], win_w) for d in dims], jnp.float32)
    true_h = jnp.asarray([d[0] for d in dims], jnp.float32)
    true_w = jnp.asarray([d[1] for d in dims], jnp.float32)
    strides_arr = jnp.asarray(strides, jnp.float32)

    def per_image(bx):
        level = assign_levels(bx, num_levels, canonical_scale,
                              canonical_level, min_level,
                              max_span_cells=float(win - 2),
                              base_stride=float(strides[0]))
        scale = 1.0 / strides_arr[level]
        hf = true_h[level]
        wf = true_w[level]
        hp = heights[level]
        wp = widths[level]
        shift = 0.5 if aligned else 0.0
        x1 = bx[:, 0] * scale - shift
        y1 = bx[:, 1] * scale - shift
        x2 = bx[:, 2] * scale - shift
        y2 = bx[:, 3] * scale - shift
        roi_w = x2 - x1
        roi_h = y2 - y1
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        bin_h = roi_h / output_size
        bin_w = roi_w / output_size
        # Window origins: at the sample start, clamped so the window stays
        # inside the (padded) level; x additionally 8-aligned DOWN.
        y0 = jnp.floor(jnp.clip(y1, 0.0, hf - 1.0))
        y0 = jnp.clip(y0, 0.0, hp - win_h)
        x0 = jnp.floor(jnp.clip(x1, 0.0, wf - 1.0))
        x0 = jnp.minimum(x0, wp - win_w)
        x0 = jnp.maximum(jnp.floor(x0 / SUB_ALIGN) * SUB_ALIGN, 0.0)
        ints = jnp.stack([level, y0.astype(jnp.int32),
                          x0.astype(jnp.int32),
                          jnp.zeros_like(level)], axis=-1)
        f32s = jnp.stack([y1, x1, bin_h, bin_w, y0, x0, hf, wf], axis=-1)
        return ints.astype(jnp.int32), f32s

    return jax.vmap(per_image)(boxes)


def _weight_matrix(coord0, bin_size, origin, size_f, out, ratio, win):
    """Pooling-folded interpolation weights ``[out, win]`` for one axis.

    Row ``j`` holds the mean over the bin's ``ratio`` sample points of the
    bilinear hat weights against window cells (mean pooling of separable
    products == product of averaged weights).  Built from 2D iotas only.
    """
    s = out * ratio
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (s, win), 0)
    grid = ((idx_i // ratio).astype(jnp.float32)
            + ((idx_i % ratio).astype(jnp.float32) + 0.5) / ratio)
    samples = coord0 + grid * bin_size
    inside = (samples >= -1.0) & (samples <= size_f)
    clamped = jnp.clip(samples, 0.0, size_f - 1.0)
    rel = jnp.clip(clamped - origin, 0.0, jnp.float32(win) - 1.0)
    cells = jax.lax.broadcasted_iota(jnp.int32, (s, win), 1).astype(
        jnp.float32)
    w = jnp.maximum(1.0 - jnp.abs(rel - cells), 0.0)
    w = w * inside.astype(jnp.float32)
    return w.reshape(out, ratio, win).mean(axis=1)


def _dot(a, b, a_dim, b_dim):
    return jax.lax.dot_general(
        a, b, (((a_dim,), (b_dim,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(out_size, ratio, win_h, win_w, channels, num_levels,
                k_total):
    def kernel(int_ref, f32_ref, *refs):
        level_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        windows = refs[num_levels + 1]   # [2, win_h, win_w, C] double buffer
        sems = refs[num_levels + 2]      # [2]
        b = pl.program_id(0)
        k = pl.program_id(1)
        step = b * k_total + k
        total = pl.num_programs(0) * k_total
        slot = jax.lax.rem(step, 2)
        next_slot = jax.lax.rem(step + 1, 2)

        def dma_for(idx, slot_idx):
            ib = idx * 4
            bb = idx // k_total
            lvl_i = int_ref[ib + 0]
            y0_i = int_ref[ib + 1]
            x0_i = pl.multiple_of(int_ref[ib + 2], SUB_ALIGN)
            return lvl_i, [
                pltpu.make_async_copy(
                    level_refs[l].at[bb, pl.ds(y0_i, win_h),
                                     pl.ds(x0_i, win_w), :],
                    windows.at[slot_idx], sems.at[slot_idx])
                for l in range(num_levels)
            ]

        def start(idx, slot_idx):
            lvl_i, copies = dma_for(idx, slot_idx)
            for l in range(num_levels):
                @pl.when(lvl_i == l)
                def _():
                    copies[l].start()

        @pl.when(step == 0)
        def _():
            start(step, slot)

        @pl.when(step + 1 < total)
        def _():
            start(step + 1, next_slot)

        fb = step * 8
        y1 = f32_ref[fb + 0]
        x1 = f32_ref[fb + 1]
        bin_h = f32_ref[fb + 2]
        bin_w = f32_ref[fb + 3]
        y0 = f32_ref[fb + 4]
        x0 = f32_ref[fb + 5]
        hf = f32_ref[fb + 6]
        wf = f32_ref[fb + 7]
        ay = _weight_matrix(y1, bin_h, y0, hf, out_size, ratio, win_h)
        ax = _weight_matrix(x1, bin_w, x0, wf, out_size, ratio, win_w)

        lvl, copies = dma_for(step, slot)
        for l in range(num_levels):
            @pl.when(lvl == l)
            def _():
                copies[l].wait()

        w = windows[slot].astype(jnp.float32)       # [win_h, win_w, C]
        t1 = _dot(ax, w, 1, 1)                      # [out, win_h, C]
        t2 = _dot(ay, t1, 1, 1)                     # [out_y, out_x, C]
        out_ref[0, 0] = t2.astype(out_ref.dtype)

    return kernel


def _bwd_kernel(out_size, ratio, win_h, win_w, channels, num_levels,
                k_total):
    def kernel(int_ref, f32_ref, *refs):
        # refs: [0, 2L) aliased grad inputs, [2L] upstream grad block,
        # [2L+1, 4L+1) grad outputs (two parity sets), then scratch.
        g_ref = refs[2 * num_levels]
        grad_refs = refs[2 * num_levels + 1: 4 * num_levels + 1]
        windows = refs[4 * num_levels + 1]          # [2, wh, ww, C]
        accs = refs[4 * num_levels + 2]             # [2, wh, ww, C]
        read_sems = refs[4 * num_levels + 3]
        write_sems = refs[4 * num_levels + 4]
        b = pl.program_id(0)
        k = pl.program_id(1)
        step = b * k_total + k
        total = pl.num_programs(0) * k_total
        slot = jax.lax.rem(step, 2)
        nslot = jax.lax.rem(step + 1, 2)

        def dmas(idx, slot_idx, write):
            ib = idx * 4
            bb = idx // k_total
            lvl_i = int_ref[ib + 0]
            y0_i = int_ref[ib + 1]
            x0_i = pl.multiple_of(int_ref[ib + 2], SUB_ALIGN)
            pset = jax.lax.rem(idx, 2)
            copies = []
            for l in range(num_levels):
                for par in range(2):
                    ref = grad_refs[par * num_levels + l].at[
                        bb, pl.ds(y0_i, win_h), pl.ds(x0_i, win_w), :]
                    if write:
                        copies.append(((lvl_i == l) & (pset == par),
                                       pltpu.make_async_copy(
                                           accs.at[slot_idx], ref,
                                           write_sems.at[slot_idx])))
                    else:
                        copies.append(((lvl_i == l) & (pset == par),
                                       pltpu.make_async_copy(
                                           ref, windows.at[slot_idx],
                                           read_sems.at[slot_idx])))
            return copies

        def run(copies, op):
            for cond, copy in copies:
                @pl.when(cond)
                def _():
                    getattr(copy, op)()

        @pl.when(step == 0)
        def _():
            run(dmas(step, slot, write=False), "start")

        fb = step * 8
        y1 = f32_ref[fb + 0]
        x1 = f32_ref[fb + 1]
        bin_h = f32_ref[fb + 2]
        bin_w = f32_ref[fb + 3]
        y0 = f32_ref[fb + 4]
        x0 = f32_ref[fb + 5]
        hf = f32_ref[fb + 6]
        wf = f32_ref[fb + 7]
        ay = _weight_matrix(y1, bin_h, y0, hf, out_size, ratio, win_h)
        ax = _weight_matrix(x1, bin_w, x0, wf, out_size, ratio, win_w)

        g = g_ref[0, 0].astype(jnp.float32)          # [out_y, out_x, C]
        # dW[wy, wx, c] = sum_{sy,sx} ay[sy,wy] ax[sx,wx] g[sy,sx,c]
        u = _dot(ax, g, 0, 1)                        # [win_w, out_y, C]
        dw = _dot(ay, u, 0, 1)                       # [win_h, win_w, C]

        run(dmas(step, slot, write=False), "wait")

        @pl.when(step >= 1)
        def _():
            run(dmas(step - 1, nslot, write=True), "wait")

        accs[slot] = (windows[slot] + dw).astype(accs.dtype)
        run(dmas(step, slot, write=True), "start")

        @pl.when(step + 1 < total)
        def _():
            run(dmas(step + 1, nslot, write=False), "start")

        @pl.when(step + 1 >= total)
        def _():
            run(dmas(step, slot, write=True), "wait")

    return kernel


def _fwd_call(padded_levels, int_params, f32_params, output_size,
              sampling_ratio, win, channels):
    b, k = int_params.shape[:2]
    num_levels = len(padded_levels)
    win_h, win_w = window_dims(win)
    kernel = _fwd_kernel(output_size, sampling_ratio, win_h, win_w, channels,
                         num_levels, k)
    return pl.pallas_call(
        kernel,
        interpret=not _is_tpu(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, k),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_levels,
            out_specs=pl.BlockSpec(
                (1, 1, output_size, output_size, channels),
                lambda i, j, *_: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, win_h, win_w, channels),
                           padded_levels[0].dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, k, output_size, output_size, channels),
            padded_levels[0].dtype),
    )(int_params.reshape(-1), f32_params.reshape(-1), *padded_levels)


def _bwd_call(grad_inits, g, int_params, f32_params, output_size,
              sampling_ratio, win, channels):
    """grad_inits: 2*num_levels zero-initialised f32 level buffers
    [B, Hp, Wp, C] (two parity sets) the kernel accumulates into (aliased
    in/out); the caller sums the sets."""
    b, k = int_params.shape[:2]
    num_levels = len(grad_inits) // 2
    win_h, win_w = window_dims(win)
    kernel = _bwd_kernel(output_size, sampling_ratio, win_h, win_w, channels,
                         num_levels, k)
    out_shapes = [jax.ShapeDtypeStruct(gi.shape, gi.dtype)
                  for gi in grad_inits]
    return pl.pallas_call(
        kernel,
        interpret=not _is_tpu(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, k),
            in_specs=([pl.BlockSpec(memory_space=pl.ANY)]
                      * (2 * num_levels)
                      + [pl.BlockSpec(
                          (1, 1, output_size, output_size, channels),
                          lambda i, j, *_: (i, j, 0, 0, 0),
                          memory_space=pltpu.VMEM)]),
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            * (2 * num_levels),
            scratch_shapes=[
                pltpu.VMEM((2, win_h, win_w, channels), jnp.float32),
                pltpu.VMEM((2, win_h, win_w, channels), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_shapes,
        input_output_aliases={2 + i: i for i in range(2 * num_levels)},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(int_params.reshape(-1), f32_params.reshape(-1), *grad_inits, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def batched_roi_align_pallas(
    features: Tuple[jnp.ndarray, ...],
    boxes: jnp.ndarray,
    strides: Tuple[int, ...],
    output_size: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = False,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    min_level: int = 2,
    win: int = DEFAULT_WIN,
) -> jnp.ndarray:
    """Batched multi-level RoIAlign.

    Args:
      features: tuple of ``[B, Hl, Wl, C]`` level maps (P2..P5).
      boxes: ``[B, K, 4]`` xyxy RoIs in image coordinates.
    Returns:
      ``[B, K, output_size, output_size, C]`` pooled features.
    """
    out, _ = _vjp_fwd(features, boxes, strides, output_size, sampling_ratio,
                      aligned, canonical_scale, canonical_level, min_level,
                      win)
    return out


def _vjp_fwd(features, boxes, strides, output_size, sampling_ratio, aligned,
             canonical_scale, canonical_level, min_level, win):
    channels = features[0].shape[-1]
    padded, dims = pad_levels(features, win)
    int_params, f32_params = _roi_params(
        boxes, strides, dims, output_size, aligned, canonical_scale,
        canonical_level, min_level, win)
    out = _fwd_call(padded, int_params, f32_params, output_size,
                    sampling_ratio, win, channels)
    return out, (features, boxes, int_params, f32_params)


def _vjp_bwd(strides, output_size, sampling_ratio, aligned, canonical_scale,
             canonical_level, min_level, win, res, g):
    features, boxes, int_params, f32_params = res
    channels = features[0].shape[-1]
    win_h, win_w = window_dims(win)
    grad_inits = []
    crops = []
    for f in features:
        b, h, w, c = f.shape
        hp, wp = max(h, win_h), max(w, win_w)
        grad_inits.append(jnp.zeros((b, hp, wp, c), jnp.float32))
        crops.append((h, w, hp, wp))
    # Two parity accumulation sets (see _bwd_kernel); summed below.
    grad_inits = grad_inits + [jnp.zeros_like(gi) for gi in grad_inits]
    grads = _bwd_call(grad_inits, g.astype(jnp.float32), int_params,
                      f32_params, output_size, sampling_ratio, win, channels)
    n = len(features)
    out = []
    for i, (f, (h, w, hp, wp)) in enumerate(zip(features, crops)):
        # Cast each parity buffer BEFORE the sum: each buffer is already a
        # complete f32 partial sum, so the cast rounds once per buffer and
        # the add/crop/layout glue downstream moves bf16 instead of f32
        # (the fused add+transpose at P2 size was 7.7 ms/step in f32).
        gbuf = grads[i].astype(f.dtype) + grads[n + i].astype(f.dtype)
        if (hp, wp) != (h, w):
            gbuf = gbuf[:, :h, :w, :]
        out.append(gbuf)
    return tuple(out), jnp.zeros_like(boxes)


batched_roi_align_pallas.defvjp(_vjp_fwd, _vjp_bwd)
