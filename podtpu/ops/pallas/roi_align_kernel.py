"""Pallas TPU RoIAlign kernels (forward + backward).

Replaces the XLA point-gather formulation of
:mod:`podtpu.ops.roi_align` on the hot path (torchvision's CUDA
``roi_align``; SURVEY.md §2.2).  Measured on the full train step the XLA
gather/scatter pair costs ~50% of step time — gathers of 512-byte rows are
descriptor-bound.  Design here:

* each FPN level is stored ``[B, H, W*C]`` (channels innermost), so a RoI's
  ``WIN x WIN``-cell window is a SINGLE strided DMA per RoI;
* bilinear sampling is separable: interpolation = two small MXU matmuls with
  per-RoI hat-function weight matrices built from in-kernel iotas;
* the backward kernel runs the transposed matmuls and accumulates window
  gradients back into the level buffers with read-modify-write DMAs — safe
  because TPU Pallas grid steps execute sequentially on the core;
* grid = (batch, roi); per-RoI level selection is 4 predicated DMAs
  (``@pl.when(level == l)``), only one of which fires.

Semantics match torchvision ``roi_align`` (aligned=False) EXCEPT for RoIs
whose x/y span at their assigned FPN level exceeds ``WIN - 2`` cells: their
sample points clamp into the window (with canonical FPN level assignment
this only affects aspect ratios beyond ~1:4 or near-canvas boxes).
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


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


SUB_ALIGN = 8  # TPU sublane tile: dynamic row offsets must be 8-aligned


def lane_align_cells(channels: int) -> int:
    """Window x-origin alignment in CELLS so the lane offset (x0 * C) is
    128-aligned."""
    import math
    return max(1, 128 // math.gcd(channels, 128))


def window_dims(win: int, channels: int):
    """(win_h, win_w): window extent including alignment margins."""
    return win + SUB_ALIGN, win + lane_align_cells(channels)


def pad_levels(features: Sequence[jnp.ndarray], win: int = DEFAULT_WIN):
    """Pad each ``[B, H, W, C]`` level so any aligned window DMA stays in
    bounds, and reshape to the kernel's ``[B, Hp, Wp*C]`` layout."""
    padded = []
    dims = []
    c = features[0].shape[-1]
    win_h, win_w = window_dims(win, c)
    for f in features:
        b, h, w, _ = f.shape
        hp = max(h, win) + SUB_ALIGN
        wp = max(w, win) + lane_align_cells(c)
        f = jnp.pad(f, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        padded.append(f.reshape(b, hp, wp * c))
        dims.append((h, w))
    return padded, tuple(dims)


def _roi_params(boxes, strides, dims, output_size, aligned,
                canonical_scale, canonical_level, min_level, win, channels):
    """Per-RoI kernel parameters.

    boxes: [B, K, 4].  Returns int_params [B, K, 4] (level, y0, x0c, unused)
    and f32_params [B, K, 8] (y1, x1, bin_h, bin_w, y0f, x0f, hf, wf).
    """
    num_levels = len(strides)
    heights = jnp.asarray([d[0] for d in dims], jnp.float32)
    widths = jnp.asarray([d[1] for d in dims], jnp.float32)
    strides_arr = jnp.asarray(strides, jnp.float32)

    def per_image(bx):
        level = assign_levels(bx, num_levels, canonical_scale,
                              canonical_level, min_level,
                              max_span_cells=float(win - 2),
                              base_stride=float(strides[0]))
        scale = 1.0 / strides_arr[level]
        hf = heights[level]
        wf = widths[level]
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
        y0 = jnp.clip(jnp.floor(jnp.clip(y1, 0.0, hf - 1.0)), 0.0,
                      jnp.maximum(hf - win, 0.0))
        x0 = jnp.clip(jnp.floor(jnp.clip(x1, 0.0, wf - 1.0)), 0.0,
                      jnp.maximum(wf - win, 0.0))
        # Align window origins down to the DMA tiling (rows to the sublane
        # tile; cols so the lane offset x0*C is 128-aligned); the window
        # extent carries a matching margin (window_dims).
        y0 = jnp.floor(y0 / SUB_ALIGN) * SUB_ALIGN
        la = lane_align_cells(channels)
        x0 = jnp.floor(x0 / la) * la
        ints = jnp.stack([level, y0.astype(jnp.int32),
                          x0.astype(jnp.int32),
                          jnp.zeros_like(level)], axis=-1)
        f32s = jnp.stack([y1, x1, bin_h, bin_w, y0, x0, hf, wf], axis=-1)
        return ints.astype(jnp.int32), f32s

    return jax.vmap(per_image)(boxes)


def _weight_matrix(coord0, bin_size, origin, size_f, s, ratio, win):
    """Hat-function interpolation weights [S, win] for one axis (see module
    docstring).  Built from 2D iotas only — no captured constants."""
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
    return w * inside.astype(jnp.float32)


def _fwd_kernel(out_size, ratio, win_h, win_w, channels, num_levels,
                k_total, rois_per_step):
    s = out_size * ratio
    k_steps = k_total // rois_per_step

    def kernel(int_ref, f32_ref, *refs):
        level_refs = refs[:num_levels]
        out_ref = refs[num_levels]
        windows = refs[num_levels + 1]   # [2, win_h, win_w*C] double buffer
        sems = refs[num_levels + 2]      # [2]
        b = pl.program_id(0)
        k = pl.program_id(1)
        base = (b * k_steps + k) * rois_per_step
        total = pl.num_programs(0) * k_total

        # Scalar params are flat 1D SMEM arrays (2D+ SMEM operands get their
        # last dim padded to 128 lanes and blow the 1MB SMEM budget).
        def dma_for(idx, slot_idx):
            """Window DMA descriptor for linear roi index ``idx``."""
            ib = idx * 4
            bb = idx // k_total
            lvl_i = int_ref[ib + 0]
            y0_i = pl.multiple_of(int_ref[ib + 1], SUB_ALIGN)
            x0_c = pl.multiple_of(int_ref[ib + 2] * channels, 128)
            return lvl_i, [
                pltpu.make_async_copy(
                    level_refs[l].at[bb, pl.ds(y0_i, win_h),
                                     pl.ds(x0_c, win_w * channels)],
                    windows.at[slot_idx], sems.at[slot_idx])
                for l in range(num_levels)
            ]

        def start(idx, slot_idx):
            lvl_i, copies = dma_for(idx, slot_idx)
            for l in range(num_levels):
                @pl.when(lvl_i == l)
                def _():
                    copies[l].start()

        # Several RoIs per grid step amortise the per-step fixed cost; the
        # per-RoI double-buffered DMA pipeline is unchanged (the r-loop is
        # unrolled at trace time).
        for r in range(rois_per_step):
            idx = base + r
            slot = jax.lax.rem(idx, 2)
            next_slot = jax.lax.rem(idx + 1, 2)

            # Warm-up: the very first roi fetches its own window.
            if r == 0:
                @pl.when(idx == 0)
                def _():
                    start(idx, slot)

            # Prefetch the NEXT roi's window while we compute this one.
            @pl.when(idx + 1 < total)
            def _():
                start(idx + 1, next_slot)

            fb = idx * 8
            y1 = f32_ref[fb + 0]
            x1 = f32_ref[fb + 1]
            bin_h = f32_ref[fb + 2]
            bin_w = f32_ref[fb + 3]
            y0 = f32_ref[fb + 4]
            x0 = f32_ref[fb + 5]
            hf = f32_ref[fb + 6]
            wf = f32_ref[fb + 7]
            ay = _weight_matrix(y1, bin_h, y0, hf, s, ratio, win_h)
            ax = _weight_matrix(x1, bin_w, x0, wf, s, ratio, win_w)

            lvl, copies = dma_for(idx, slot)
            for l in range(num_levels):
                @pl.when(lvl == l)
                def _():
                    copies[l].wait()

            w = windows[slot].astype(jnp.float32)          # [win_h, win_w*C]
            t1 = jnp.dot(ay, w, preferred_element_type=jnp.float32)
            t1 = t1.reshape(s, win_w, channels)
            t1 = jnp.swapaxes(t1, 0, 1).reshape(win_w, s * channels)
            t2 = jnp.dot(ax, t1, preferred_element_type=jnp.float32)
            t2 = jnp.swapaxes(t2.reshape(s, s, channels), 0, 1)  # [sy,sx,C]
            pooled = t2.reshape(out_size, ratio, out_size, ratio, channels)
            pooled = pooled.mean(axis=(1, 3))
            out_ref[0, r] = pooled.astype(out_ref.dtype)

    return kernel


def _bwd_kernel(out_size, ratio, win_h, win_w, channels, num_levels,
                k_total, rois_per_step):
    """Backward accumulation, parity-pipelined.

    Even/odd RoIs accumulate into two SEPARATE buffer sets (summed by the
    caller), so roi i's window read never races roi i-1's write — both DMAs
    overlap the neighbouring rois' compute, and the only synchronisation is
    waiting the write from two rois ago.  Several RoIs run per grid step
    (unrolled) to amortise the per-step fixed cost.
    """
    s = out_size * ratio
    inv = 1.0 / (ratio * ratio)
    k_steps = k_total // rois_per_step

    def kernel(int_ref, f32_ref, *refs):
        # refs: [0, 2L) aliased grad inputs (unused; outputs below are the
        # same buffers), [2L] upstream grad block, [2L+1, 4L+1) grad outputs
        # (two parity sets), then scratch.
        g_ref = refs[2 * num_levels]
        grad_refs = refs[2 * num_levels + 1: 4 * num_levels + 1]
        windows = refs[4 * num_levels + 1]                  # [2, wh, ww*C]
        accs = refs[4 * num_levels + 2]                     # [2, wh, ww*C]
        read_sems = refs[4 * num_levels + 3]                # [2]
        write_sems = refs[4 * num_levels + 4]               # [2]
        b = pl.program_id(0)
        k = pl.program_id(1)
        base = (b * k_steps + k) * rois_per_step
        total = pl.num_programs(0) * k_total

        def read_dma(idx, slot_idx):
            ib = idx * 4
            bb = idx // k_total
            lvl_i = int_ref[ib + 0]
            y0_i = pl.multiple_of(int_ref[ib + 1], SUB_ALIGN)
            x0_c = pl.multiple_of(int_ref[ib + 2] * channels, 128)
            pset = jax.lax.rem(idx, 2)
            copies = []
            for l in range(num_levels):
                for par in range(2):
                    copies.append(
                        ((lvl_i == l) & (pset == par),
                         pltpu.make_async_copy(
                             grad_refs[par * num_levels + l].at[
                                 bb, pl.ds(y0_i, win_h),
                                 pl.ds(x0_c, win_w * channels)],
                             windows.at[slot_idx],
                             read_sems.at[slot_idx])))
            return copies

        def write_dma(idx, slot_idx):
            ib = idx * 4
            bb = idx // k_total
            lvl_i = int_ref[ib + 0]
            y0_i = pl.multiple_of(int_ref[ib + 1], SUB_ALIGN)
            x0_c = pl.multiple_of(int_ref[ib + 2] * channels, 128)
            pset = jax.lax.rem(idx, 2)
            copies = []
            for l in range(num_levels):
                for par in range(2):
                    copies.append(
                        ((lvl_i == l) & (pset == par),
                         pltpu.make_async_copy(
                             accs.at[slot_idx],
                             grad_refs[par * num_levels + l].at[
                                 bb, pl.ds(y0_i, win_h),
                                 pl.ds(x0_c, win_w * channels)],
                             write_sems.at[slot_idx])))
            return copies

        def run(copies, op):
            for cond, copy in copies:
                @pl.when(cond)
                def _():
                    getattr(copy, op)()

        for r in range(rois_per_step):
            idx = base + r
            slot = jax.lax.rem(idx, 2)
            nslot = jax.lax.rem(idx + 1, 2)

            # The very first roi fetches its own window; later rois were
            # prefetched by their predecessor.
            if r == 0:
                @pl.when(idx == 0)
                def _():
                    run(read_dma(idx, slot), "start")

            fb = idx * 8
            y1 = f32_ref[fb + 0]
            x1 = f32_ref[fb + 1]
            bin_h = f32_ref[fb + 2]
            bin_w = f32_ref[fb + 3]
            y0 = f32_ref[fb + 4]
            x0 = f32_ref[fb + 5]
            hf = f32_ref[fb + 6]
            wf = f32_ref[fb + 7]
            ay = _weight_matrix(y1, bin_h, y0, hf, s, ratio, win_h)
            ax = _weight_matrix(x1, bin_w, x0, wf, s, ratio, win_w)

            g = g_ref[0, r].astype(jnp.float32)                # [7, 7, C]
            # Upsample bins to sample points (each sample gets g/ratio^2).
            g = jnp.repeat(jnp.repeat(g, ratio, axis=0), ratio, axis=1) * inv
            # dU[wy, sx, c] = sum_sy ay[sy, wy] g[sy, sx, c]
            du = jnp.dot(ay.T, g.reshape(s, s * channels),
                         preferred_element_type=jnp.float32)  # [win_h, S*C]
            du = du.reshape(win_h, s, channels)
            du = jnp.swapaxes(du, 0, 1).reshape(s, win_h * channels)
            # dW[wx, wy, c] = sum_sx ax[sx, wx] dU[wy, sx, c]
            dw = jnp.dot(ax.T, du, preferred_element_type=jnp.float32)
            dw = jnp.swapaxes(dw.reshape(win_w, win_h, channels), 0, 1)

            run(read_dma(idx, slot), "wait")

            # Drain the write from the previous roi: it targeted the OTHER
            # parity set, which the upcoming prefetch reads from.
            @pl.when(idx >= 1)
            def _():
                run(write_dma(idx - 1, nslot), "wait")

            accs[slot] = (windows[slot]
                          + dw.reshape(win_h, win_w * channels)).astype(
                              accs.dtype)
            run(write_dma(idx, slot), "start")

            # Prefetch the next roi's window (other parity set: no
            # outstanding writes there after the drain above).
            @pl.when(idx + 1 < total)
            def _():
                run(read_dma(idx + 1, nslot), "start")

            @pl.when(idx + 1 >= total)
            def _():
                run(write_dma(idx, slot), "wait")

    return kernel


def _rois_per_step(k: int) -> int:
    """RoIs processed per grid step.  Measured on v5e at 4x512 fwd+bwd:
    1/2/4/8 -> 22.3/22.8/22.9/25.7 ms — the kernel is bound by the tiny
    per-roi interpolation matmuls and DMA, NOT per-step overhead, so
    batching rois per step only bloats the unrolled body.  Default 1;
    PODTPU_ROI_RPS forces another value for experiments."""
    import os
    forced = os.environ.get("PODTPU_ROI_RPS")
    if forced and k % int(forced) == 0:
        return int(forced)
    return 1


def _fwd_call(padded_levels, int_params, f32_params, output_size,
              sampling_ratio, win, channels):
    b, k = int_params.shape[:2]
    num_levels = len(padded_levels)
    win_h, win_w = window_dims(win, channels)
    rps = _rois_per_step(k)
    kernel = _fwd_kernel(output_size, sampling_ratio, win_h, win_w, channels,
                         num_levels, k, rps)
    return pl.pallas_call(
        kernel,
        interpret=not _is_tpu(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, k // rps),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * num_levels,
            out_specs=pl.BlockSpec(
                (1, rps, output_size, output_size, channels),
                lambda i, j, *_: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, win_h, win_w * channels),
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
    [B, Hp, Wp*C] (two parity sets) the kernel accumulates into (aliased
    in/out); the caller sums the sets."""
    b, k = int_params.shape[:2]
    num_levels = len(grad_inits) // 2
    win_h, win_w = window_dims(win, channels)
    rps = _rois_per_step(k)
    kernel = _bwd_kernel(output_size, sampling_ratio, win_h, win_w, channels,
                         num_levels, k, rps)
    out_shapes = [jax.ShapeDtypeStruct(gi.shape, gi.dtype)
                  for gi in grad_inits]
    return pl.pallas_call(
        kernel,
        interpret=not _is_tpu(),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, k // rps),
            in_specs=([pl.BlockSpec(memory_space=pl.ANY)]
                      * (2 * num_levels)
                      + [pl.BlockSpec(
                          (1, rps, output_size, output_size, channels),
                          lambda i, j, *_: (i, j, 0, 0, 0),
                          memory_space=pltpu.VMEM)]),
            out_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            * (2 * num_levels),
            scratch_shapes=[
                pltpu.VMEM((2, win_h, win_w * channels), jnp.float32),
                pltpu.VMEM((2, win_h, win_w * channels), jnp.float32),
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
        canonical_level, min_level, win, channels)
    out = _fwd_call(padded, int_params, f32_params, output_size,
                    sampling_ratio, win, channels)
    return out, (features, boxes, int_params, f32_params)


def _vjp_bwd(strides, output_size, sampling_ratio, aligned, canonical_scale,
             canonical_level, min_level, win, res, g):
    features, boxes, int_params, f32_params = res
    channels = features[0].shape[-1]
    grad_inits = []
    crops = []
    for f in features:
        b, h, w, c = f.shape
        hp = max(h, win) + SUB_ALIGN
        wp = max(w, win) + lane_align_cells(c)
        grad_inits.append(jnp.zeros((b, hp, wp * c), jnp.float32))
        crops.append((h, w, hp, wp))
    # Two parity accumulation sets (see _bwd_kernel); summed below.
    grad_inits = grad_inits + [jnp.zeros_like(gi) for gi in grad_inits]
    grads = _bwd_call(grad_inits, g.astype(jnp.float32), int_params,
                      f32_params, output_size, sampling_ratio, win, channels)
    n = len(features)
    out = []
    for i, (f, (h, w, hp, wp)) in enumerate(zip(features, crops)):
        b, c = f.shape[0], f.shape[-1]
        gbuf = grads[i] + grads[n + i]
        gb = gbuf.reshape(b, hp, wp, c)[:, :h, :w, :]
        out.append(gb.astype(f.dtype))
    return tuple(out), jnp.zeros_like(boxes)


batched_roi_align_pallas.defvjp(_vjp_fwd, _vjp_bwd)
