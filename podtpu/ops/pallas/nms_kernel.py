"""Pallas TPU NMS kernel.

The Pallas counterpart of :func:`podtpu.ops.nms.nms_keep`'s fixpoint
formulation (itself the TPU-native replacement for torchvision's CUDA
``nms``; SURVEY.md §2.2): greedy NMS as the unique fixpoint of

    keep[i] = valid[i] and not any(j < i: keep[j] and IoU(i, j) > t)

over score-sorted boxes.  The XLA version materializes the [N, N]
suppression matrix in HBM and re-reads it every fixpoint iteration; here the
matrix is built tile-by-tile straight into VMEM (N=2048 bf16: 8 MB) and the
iteration's matvecs run MXU-resident — zero HBM traffic after the input
load.

VMEM layout notes: boxes ride in transposed ``[8, N]`` form (x1/y1/x2/y2/
valid rows — a [N, 4] block would lane-pad 4 -> 128 and waste a megabyte),
the suppression matrix is stored TRANSPOSED (``supT[j, i] = j suppresses
i``) so the fixpoint iterates on ``[1, N]`` row vectors, and the matrix is
built in 64-row tiles to bound live intermediates.  N is capped at 2048
(8 MB matrix); callers fall back to the XLA path beyond that.

Inputs must be pre-sorted by descending score with ``valid`` marking real
entries; N must be a multiple of 128.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # lane-dim slices must sit on 128-multiples
MAX_N = 2048


def _nms_kernel(iou_threshold: float, n: int):
    num_tiles = n // TILE

    def kernel(boxes_ref, keep_ref, supt, keep_row):
        # boxes_ref: [8, N] f32 rows (x1, y1, x2, y2, valid, 0, 0, 0).
        # supt: [N, N] bf16 scratch, supT[j, i] = "j suppresses i".
        # keep_row: [8, N] f32 scratch (row 0 used).
        x1 = boxes_ref[0, :]
        y1 = boxes_ref[1, :]
        x2 = boxes_ref[2, :]
        y2 = boxes_ref[3, :]
        valid = boxes_ref[4, :]
        area = (x2 - x1) * (y2 - y1)

        # supT[j, i] = valid_i & valid_j & (j < i) & (iou(i, j) > t),
        # built in TILE-row (j) stripes.
        def build_tile(t, _):
            sl = pl.ds(pl.multiple_of(t * TILE, TILE), TILE)
            jx1 = boxes_ref[0, sl][:, None]   # [TILE, 1]
            jy1 = boxes_ref[1, sl][:, None]
            jx2 = boxes_ref[2, sl][:, None]
            jy2 = boxes_ref[3, sl][:, None]
            jvalid = boxes_ref[4, sl][:, None]
            jarea = (jx2 - jx1) * (jy2 - jy1)
            ix1 = jnp.maximum(jx1, x1[None, :])
            iy1 = jnp.maximum(jy1, y1[None, :])
            ix2 = jnp.minimum(jx2, x2[None, :])
            iy2 = jnp.minimum(jy2, y2[None, :])
            inter = (jnp.maximum(ix2 - ix1, 0.0)
                     * jnp.maximum(iy2 - iy1, 0.0))
            union = jarea + area[None, :] - inter
            iou = jnp.where(union > 0, inter / union, 0.0)
            row_j = (t * TILE
                     + jax.lax.broadcasted_iota(jnp.int32, (TILE, n), 0))
            col_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, n), 1)
            s = ((iou > iou_threshold) & (row_j < col_i)
                 & (jvalid > 0.5) & (valid[None, :] > 0.5))
            supt[sl, :] = s.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, num_tiles, build_tile, 0)

        # Fixpoint: keep = valid & !(keep @ supT).
        def body(state):
            _, keep_prev = state               # [1, N] f32
            hit = jnp.dot(keep_prev.astype(jnp.bfloat16), supt[...],
                          preferred_element_type=jnp.float32)  # [1, N]
            keep_new = jnp.where((hit < 0.5) & (valid[None, :] > 0.5),
                                 1.0, 0.0)
            changed = jnp.sum(jnp.abs(keep_new - keep_prev)) > 0.0
            return changed, keep_new

        _, keep_final = jax.lax.while_loop(
            lambda st: st[0], body, (jnp.bool_(True), valid[None, :]))
        keep_row[0, :] = keep_final[0]
        keep_ref[...] = keep_row[0:1, :]

    return kernel


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_fixpoint_pallas(sorted_boxes: jnp.ndarray, valid: jnp.ndarray,
                        iou_threshold: float) -> jnp.ndarray:
    """Greedy-NMS keep mask over score-sorted ``[N, 4]`` boxes
    (N % 128 == 0, N <= 2048).  Returns a ``[N]`` bool mask (sorted order).
    """
    n = sorted_boxes.shape[0]
    assert n % 128 == 0, f"N must be a multiple of 128, got {n}"
    assert n <= MAX_N, f"N={n} exceeds the kernel cap {MAX_N}"
    packed = jnp.zeros((8, n), jnp.float32)
    packed = packed.at[:4, :].set(sorted_boxes.astype(jnp.float32).T)
    packed = packed.at[4, :].set(valid.astype(jnp.float32))
    kernel = _nms_kernel(float(iou_threshold), n)
    keep = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n, n), jnp.bfloat16),
            pltpu.VMEM((8, n), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
    )(packed)
    return keep[0] > 0.5
