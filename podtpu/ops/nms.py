"""Non-maximum suppression, TPU-style.

TPU-native replacement for torchvision's CUDA/C++ ``nms`` used inside the
reference's model for both RPN proposal filtering and detection postprocessing
(reference `miso/object_detection/models.py:8-12`; SURVEY.md §2.2).

Instead of the GPU's sequential greedy scan (data-dependent shapes, scalar
control flow), NMS is computed as a **fixpoint of a masked matrix iteration**:

    keep[i] = valid[i] and not any(j < i, in score order: keep[j] and IoU(i,j) > t)

The map is antitone in ``keep`` and the dependency structure is strictly
triangular in score order, so iterating it converges to the *unique* fixpoint,
which is exactly the greedy-NMS solution; convergence takes at most
``suppression-chain-depth`` iterations (typically < 8, worst case N).  Each
iteration is one [N, N] @ [N] masked matvec — MXU work with static shapes, no
per-box control flow.  Outputs are fixed-size keep masks, never dynamically
sized index lists.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from podtpu.ops.boxes import box_iou

NEG_INF = -1e10


def nms_keep(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Greedy NMS keep-mask over ``[N, 4]`` xyxy boxes.

    Exact greedy semantics (ties broken by original index, like a stable
    descending sort on scores).  Returns a ``[N]`` bool mask in the original
    box order.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    masked_scores = jnp.where(valid, scores, NEG_INF)
    # Stable argsort on -scores: ties keep original order (greedy convention).
    order = jnp.argsort(-masked_scores, stable=True)
    sboxes = boxes[order]
    svalid = valid[order]

    from podtpu.ops.pallas.nms_kernel import MAX_N as _PALLAS_MAX_N

    if jax.default_backend() == "tpu" and n > _PALLAS_MAX_N:
        # Beyond the kernel cap the stripe exceeds VMEM; the fixpoint below
        # still works but thrashes HBM and its iteration count is
        # data-dependent (VERDICT weak #7: make the silent fallback loud).
        import warnings
        warnings.warn(
            f"nms_keep: n={n} exceeds the Pallas kernel's {_PALLAS_MAX_N}-box"
            " cap; falling back to the XLA fixpoint (slower). Consider "
            "lowering rpn_post_nms_topk / detections capacities.",
            RuntimeWarning, stacklevel=2)

    if jax.default_backend() == "tpu" and 256 <= n <= _PALLAS_MAX_N:
        # Pallas kernel: blockwise-sequential greedy in VMEM (pad to the
        # 128 tile; padding slots are invalid).
        from podtpu.ops.pallas.nms_kernel import nms_fixpoint_pallas

        pad = (-n) % 128
        # The keep mask is boolean (non-differentiable); sever tangents so
        # the pallas_call is never JVP-traced under grad.
        pboxes = jax.lax.stop_gradient(jnp.pad(sboxes, ((0, pad), (0, 0))))
        pvalid = jnp.pad(svalid, (0, pad))
        keep = nms_fixpoint_pallas(pboxes, pvalid, float(iou_threshold))[:n]
        return jnp.zeros((n,), bool).at[order].set(keep)

    iou = box_iou(sboxes, sboxes)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    # suppress[i, j]: higher-scored valid j can suppress i.  The matrix holds
    # only 0/1 so bf16 matvecs on the MXU are exact (counts < 256 per step
    # only need the comparison against 0.5 to be safe, and small integers are
    # exactly representable in bf16 up to 256).
    suppress = (
        (iou > iou_threshold) & (col < row) & svalid[None, :] & svalid[:, None]
    ).astype(jnp.bfloat16)

    def body(state):
        keep, _prev = state
        hit = suppress @ keep.astype(jnp.bfloat16)
        new_keep = svalid & (hit < 0.5)
        return new_keep, keep

    def cond(state):
        keep, prev = state
        return jnp.any(keep != prev)

    keep0 = svalid
    keep, _ = jax.lax.while_loop(cond, body, (keep0, jnp.zeros_like(keep0)))
    # Scatter back to original order.
    return jnp.zeros((n,), bool).at[order].set(keep)


def batched_nms_keep(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Category-aware NMS: boxes with different ``idxs`` never suppress each
    other.  Uses the coordinate-offset trick (same as torchvision's
    ``batched_nms``) so a single NMS pass handles all categories/levels.
    """
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), bool)
    max_coord = jnp.max(jnp.where(valid[:, None] if valid is not None else True,
                                  boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_keep(shifted, scores, iou_threshold, valid=valid)


def topk_by_score(
    scores: jnp.ndarray, keep: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the top-``k`` kept entries by score (padded, with validity).

    Returns ``(idx[k], valid[k])``; invalid slots point at index 0.
    """
    masked = jnp.where(keep, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(masked, k)
    return idx, top_scores > NEG_INF / 2


def nms_select(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    k: int,
    valid: Optional[jnp.ndarray] = None,
    idxs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NMS then top-k: fixed-size ``(boxes[k,4], scores[k], valid[k])``.

    The one-stop static-shape NMS used by the RPN (proposal selection) and the
    detection head (per-class final filtering, via ``idxs``).
    """
    if idxs is not None:
        keep = batched_nms_keep(boxes, scores, idxs, iou_threshold, valid=valid)
    else:
        keep = nms_keep(boxes, scores, iou_threshold, valid=valid)
    idx, out_valid = topk_by_score(scores, keep, k)
    out_boxes = jnp.where(out_valid[:, None], boxes[idx], 0.0)
    out_scores = jnp.where(out_valid, scores[idx], 0.0)
    return out_boxes, out_scores, out_valid
