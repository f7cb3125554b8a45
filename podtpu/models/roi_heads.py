"""RoI box/mask heads (Flax linen), static-shape TPU design.

TPU-native equivalent of torchvision's ``RoIHeads`` + ``FastRCNNPredictor``
(+ ``MaskRCNNPredictor``) inside the reference's model
(`miso/object_detection/models.py:8-25`).  Semantics mirror torchvision:

* training: gt boxes appended to proposals, matcher (0.5/0.5, no low-quality),
  512-proposal 25%-positive sample; CE classification loss + smooth-L1
  (beta=1/9) class-specific box loss normalised by total sampled count;
* inference: softmax scores, per-class box decode with weights (10,10,5,5),
  score threshold 0.05, per-class NMS 0.5, top ``detections_per_image``
  (=300 per reference `models.py:9`).

TPU-first: RoIAlign is the single-pass flattened-FPN kernel from
podtpu.ops.roi_align; sampling compacts into a fixed 512-slot gather; the
per-class NMS is a vmap over classes of the fixpoint NMS.  All shapes static.
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from podtpu.core.config import ModelConfig
from podtpu.models.rpn import smooth_l1
from podtpu.ops import boxes as box_ops
from podtpu.ops import matching
from podtpu.ops.nms import NEG_INF, nms_keep
from podtpu.ops.roi_align import multilevel_roi_align


class BoxHead(nn.Module):
    """Two-MLP head + class/box predictors (torchvision TwoMLPHead +
    FastRCNNPredictor equivalent)."""

    num_classes: int
    hidden: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = pooled.reshape(pooled.shape[0], -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.hidden, name="fc6", **kw)(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc7", **kw)(x))
        logits = nn.Dense(self.num_classes, name="cls", **kw)(x)
        deltas = nn.Dense(self.num_classes * 4, name="reg", **kw)(x)
        return logits.astype(jnp.float32), deltas.astype(jnp.float32)


class ConvFCBoxHead(nn.Module):
    """4x (conv256 + frozen norm + relu) -> fc1024 -> class/box predictors
    (torchvision ``FastRCNNConvFCHead`` — the v2 recipe's box head;
    checkpoint BatchNorm statistics import into the frozen collection)."""

    num_classes: int
    channels: int = 256
    hidden: int = 1024
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        from podtpu.models.resnet import FrozenBatchNorm

        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = pooled.astype(self.dtype)
        for i in range(4):
            x = nn.Conv(self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                        use_bias=False, name=f"conv{i + 1}", **kw)(x)
            x = nn.relu(FrozenBatchNorm(self.channels, dtype=self.dtype,
                                        name=f"bn{i + 1}")(x))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden, name="fc", **kw)(x))
        logits = nn.Dense(self.num_classes, name="cls", **kw)(x)
        deltas = nn.Dense(self.num_classes * 4, name="reg", **kw)(x)
        return logits.astype(jnp.float32), deltas.astype(jnp.float32)


class MaskHead(nn.Module):
    """4x conv + deconv + per-class mask logits (MaskRCNNHeads +
    MaskRCNNPredictor equivalent; reference `models.py:15-25`).
    ``norm=True`` adds frozen norms after the tower convs (the
    ``maskrcnn_resnet50_fpn_v2`` head)."""

    num_classes: int
    channels: int = 256
    norm: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        from podtpu.models.resnet import FrozenBatchNorm

        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = pooled.astype(self.dtype)
        for i in range(4):
            x = nn.Conv(self.channels, (3, 3),
                        padding=[(1, 1), (1, 1)], use_bias=not self.norm,
                        name=f"conv{i + 1}", **kw)(x)
            if self.norm:
                x = FrozenBatchNorm(self.channels, dtype=self.dtype,
                                    name=f"bn{i + 1}")(x)
            x = nn.relu(x)
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     name="deconv", **kw)(x))
        x = nn.Conv(self.num_classes, (1, 1), name="logits", **kw)(x)
        return x.astype(jnp.float32)  # [K, 2*pool, 2*pool, C]


class KeypointOutput(NamedTuple):
    """Typed wrapper distinguishing the keypoint extra from mask grids in
    the eval-step output pytree (shape sniffing is ambiguous at K=3)."""

    keypoints: jnp.ndarray  # [B, D, K, 3] (x, y, score)


class KeypointHead(nn.Module):
    """8x conv512 + deconv + 2x bilinear upsample -> per-keypoint heatmap
    logits (torchvision ``KeypointRCNNHeads`` + ``KeypointRCNNPredictor``).

    14x14 pooled features -> 8 relu convs -> ConvTranspose(4x4, s2, p1) to
    28x28 -> bilinear (half-pixel / align_corners=False) 2x to 56x56, one
    channel per keypoint.
    """

    num_keypoints: int
    channels: int = 512
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pooled: jnp.ndarray):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = pooled.astype(self.dtype)
        for i in range(8):
            x = nn.relu(nn.Conv(self.channels, (3, 3),
                                padding=[(1, 1), (1, 1)],
                                name=f"conv{i + 1}", **kw)(x))
        # torch ConvTranspose2d(k=4, s=2, p=1): out = 2*in.  Flax pads the
        # DILATED input, so torch's p maps to k-1-p = 2 per side (layout +
        # numerics verified vs torch in tests/test_keypoints.py).
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             padding=[(2, 2), (2, 2)], name="deconv",
                             **kw)(x)
        x = x.astype(jnp.float32)
        n, h, w, k = x.shape
        # Bilinear x2, half-pixel sampling (torch interpolate
        # align_corners=False).
        x = jax.image.resize(x, (n, 2 * h, 2 * w, k), method="linear")
        return x  # [N, 4*pool, 4*pool, K] heatmap logits


def keypoints_to_heatmap(kps: jnp.ndarray, rois: jnp.ndarray,
                         heatmap_size: int):
    """Discretise gt keypoints into per-RoI heatmap cells (torchvision
    ``keypoints_to_heatmap``): returns ``(lin_index [S, K] int32,
    valid [S, K] bool)`` — valid means visible AND inside the RoI."""
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    sx = heatmap_size / jnp.maximum(rois[:, 2:3] - x1, 1e-6)
    sy = heatmap_size / jnp.maximum(rois[:, 3:4] - y1, 1e-6)
    # Boundary rule on ORIGINAL coordinates (torchvision: x == rois[:, 2]
    # snaps into the last cell; anything strictly beyond stays invalid).
    x_edge = kps[..., 0] == rois[:, 2:3]
    y_edge = kps[..., 1] == rois[:, 3:4]
    x = jnp.floor((kps[..., 0] - x1) * sx).astype(jnp.int32)
    y = jnp.floor((kps[..., 1] - y1) * sy).astype(jnp.int32)
    x = jnp.where(x_edge, heatmap_size - 1, x)
    y = jnp.where(y_edge, heatmap_size - 1, y)
    inside = (x >= 0) & (y >= 0) & (x < heatmap_size) & (y < heatmap_size)
    valid = inside & (kps[..., 2] > 0)
    lin = jnp.clip(y * heatmap_size + x, 0, heatmap_size * heatmap_size - 1)
    return lin, valid


def keypoint_loss(
    kp_logits: jnp.ndarray,    # [S, H, H, K] heatmap logits
    kp_rois: jnp.ndarray,      # [S, 4] the boxes the heatmaps were pooled
                               # over (expanded by keypoint_roi_expand)
    rois: SampledRois,
    gt_keypoints: jnp.ndarray,  # [G, K, 3] canvas coords + visibility
    sample_weight: jnp.ndarray = None,
) -> jnp.ndarray:
    """Cross-entropy over heatmap cells for visible keypoints of positive
    RoIs (torchvision ``keypointrcnn_loss``: mean CE over valid keypoints).
    """
    s, h, _, k = kp_logits.shape
    kps = gt_keypoints[rois.gt_index]           # [S, K, 3]
    target, valid = keypoints_to_heatmap(kps, kp_rois, h)
    w = valid & rois.is_pos[:, None] & rois.valid[:, None]
    w = w.astype(jnp.float32)
    if sample_weight is not None:
        w = w * sample_weight[:, None]
    logits = kp_logits.reshape(s, h * h, k)
    logits = jnp.swapaxes(logits, 1, 2).reshape(s * k, h * h)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, target.reshape(s * k, 1), axis=1)[:, 0]
    return jnp.sum(ce * w.reshape(-1)) / jnp.maximum(w.sum(), 1.0)


def expand_rois(rois: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Centre-preserving scale of ``[*, 4]`` xyxy boxes by ``factor``.

    Used by the keypoint branch (``ModelConfig.keypoint_roi_expand``) so the
    heatmap's spatial domain extends past the box border; a no-op at 1.0.
    """
    if factor == 1.0:
        return rois
    cx = (rois[..., 0] + rois[..., 2]) * 0.5
    cy = (rois[..., 1] + rois[..., 3]) * 0.5
    hw = (rois[..., 2] - rois[..., 0]) * (0.5 * factor)
    hh = (rois[..., 3] - rois[..., 1]) * (0.5 * factor)
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def heatmaps_to_keypoints(kp_logits: jnp.ndarray,
                          rois: jnp.ndarray) -> jnp.ndarray:
    """Heatmap peak -> image-space keypoints ``[D, K, 3]`` (x, y, score).

    Static-shape counterpart of torchvision's ``heatmaps_to_keypoints``,
    which bicubically resizes each 56x56 heatmap to the RoI's pixel size
    before the argmax (sub-cell precision).  A dynamic per-RoI resize cannot
    be jitted; the equivalent here is QUADRATIC SUB-CELL PEAK REFINEMENT:
    fit a parabola through the argmax cell and its two axis neighbours and
    take its vertex (the classical sub-pixel peak estimator — the continuous
    peak a bicubic upsample's argmax approaches as the upsample factor
    grows).  Offsets are clamped to half a cell; border argmaxes keep the
    cell centre.  Score is the softmax probability at the argmax cell.
    """
    d, h, _, k = kp_logits.shape
    flat = jnp.swapaxes(kp_logits.reshape(d, h * h, k), 1, 2)  # [D, K, HH]
    idx = jnp.argmax(flat, axis=-1)                            # [D, K]
    prob = jax.nn.softmax(flat, axis=-1)
    score = jnp.take_along_axis(prob, idx[..., None], axis=-1)[..., 0]
    yi = (idx // h).astype(jnp.int32)
    xi = (idx % h).astype(jnp.int32)

    def val_at(yy, xx):
        lin = jnp.clip(yy, 0, h - 1) * h + jnp.clip(xx, 0, h - 1)
        return jnp.take_along_axis(flat, lin[..., None], axis=-1)[..., 0]

    def refine(lo, c, hi, at_border):
        # Parabola vertex through (−1, lo), (0, c), (+1, hi); the denominator
        # is ≥ 0 at an argmax — guard the flat case and clamp to ±0.5 cells.
        denom = (lo - 2.0 * c + hi)
        off = jnp.where(jnp.abs(denom) > 1e-12,
                        0.5 * (lo - hi) / jnp.where(denom == 0, 1.0, denom),
                        0.0)
        return jnp.where(at_border, 0.0, jnp.clip(off, -0.5, 0.5))

    v0 = val_at(yi, xi)
    dx = refine(val_at(yi, xi - 1), v0, val_at(yi, xi + 1),
                (xi <= 0) | (xi >= h - 1))
    dy = refine(val_at(yi - 1, xi), v0, val_at(yi + 1, xi),
                (yi <= 0) | (yi >= h - 1))
    xf = xi.astype(jnp.float32) + 0.5 + dx
    yf = yi.astype(jnp.float32) + 0.5 + dy
    x1, y1 = rois[:, 0:1], rois[:, 1:2]
    w = jnp.maximum(rois[:, 2:3] - x1, 1e-6)
    hgt = jnp.maximum(rois[:, 3:4] - y1, 1e-6)
    x = x1 + xf * w / h
    y = y1 + yf * hgt / h
    return jnp.stack([x, y, score], axis=-1)


class SampledRois(NamedTuple):
    boxes: jnp.ndarray        # [S, 4]
    valid: jnp.ndarray        # [S]
    is_pos: jnp.ndarray       # [S]
    cls_targets: jnp.ndarray  # [S] int32, 0 = background
    reg_targets: jnp.ndarray  # [S, 4]
    gt_index: jnp.ndarray     # [S] matched gt index (for mask targets)


def sample_rois(
    rng: jax.Array,
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: ModelConfig,
) -> SampledRois:
    """Training-time RoI subsample for ONE image (vmap over batch)."""
    # Append gt to proposals (torchvision does this so every gt has at least
    # one perfectly-overlapping positive).
    boxes = jnp.concatenate([proposals, gt_boxes], axis=0)
    valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = box_ops.box_iou(boxes, gt_boxes)
    m = matching.match(iou, gt_valid, cfg.box_fg_iou, cfg.box_bg_iou,
                       allow_low_quality=False)
    labels = jnp.where(valid, m.labels, -1)  # exclude padded candidates
    samp = matching.balanced_sample_gather(
        rng, labels, valid, cfg.box_batch_per_image,
        cfg.box_positive_fraction, approx=cfg.approx_topk)

    sboxes = boxes[samp.idx]
    matched = m.matched_idx[samp.idx]
    cls_t = jnp.where(samp.is_pos, gt_labels[matched], 0)
    cls_t = jnp.where(samp.valid, cls_t, 0).astype(jnp.int32)
    reg_t = box_ops.encode_boxes(gt_boxes[matched], sboxes,
                                 weights=cfg.box_reg_weights)
    return SampledRois(boxes=jnp.where(samp.valid[:, None], sboxes, 0.0),
                       valid=samp.valid, is_pos=samp.is_pos,
                       cls_targets=cls_t, reg_targets=reg_t,
                       gt_index=matched)


def box_head_losses(
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    rois: SampledRois,
    sample_weight: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Classification + regression loss for one batch of sampled RoIs.

    ``logits``/``deltas`` are stacked over the whole batch ``[B*S, ...]`` and
    ``rois`` fields likewise; normalisation follows torchvision's
    ``fastrcnn_loss`` (mean CE over samples; box sum over positives / total).
    """
    n, c = logits.shape
    w = rois.valid.astype(jnp.float32)
    if sample_weight is not None:
        w = w * sample_weight
    total = jnp.maximum(w.sum(), 1.0)

    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, rois.cls_targets[:, None], axis=1)[:, 0]
    cls_loss = jnp.sum(ce * w) / total

    class_deltas = deltas.reshape(n, c, 4)
    picked = jnp.take_along_axis(
        class_deltas, rois.cls_targets[:, None, None].astype(jnp.int32)
        .repeat(4, -1), axis=1)[:, 0]
    pw = (rois.is_pos & rois.valid).astype(jnp.float32)
    if sample_weight is not None:
        pw = pw * sample_weight
    l1 = smooth_l1(picked - rois.reg_targets, beta=1.0 / 9.0).sum(-1)
    box_loss = jnp.sum(l1 * pw) / total
    return cls_loss, box_loss


class Detections(NamedTuple):
    boxes: jnp.ndarray   # [B, D, 4] xyxy, image coords
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D] int32, 1-based class ids (0 = invalid slot)
    valid: jnp.ndarray   # [B, D]


def postprocess_detections(
    logits: jnp.ndarray,      # [P, C]
    deltas: jnp.ndarray,      # [P, C*4]
    proposals: jnp.ndarray,   # [P, 4]
    prop_valid: jnp.ndarray,  # [P]
    cfg: ModelConfig,
):
    """Per-image final detection filtering (vmap over batch)."""
    p, c = logits.shape
    scores = jax.nn.softmax(logits, axis=-1)
    boxes_pc = box_ops.decode_boxes(
        deltas.reshape(p, c, 4), proposals[:, None, :],
        weights=cfg.box_reg_weights)
    boxes_pc = box_ops.clip_boxes(boxes_pc, cfg.image_size)

    # Drop background column; [C-1, P] class-major layout for vmapped NMS.
    cls_scores = scores[:, 1:].T
    cls_boxes = jnp.swapaxes(boxes_pc[:, 1:, :], 0, 1)
    ok = (cls_scores > cfg.score_thresh) & prop_valid[None, :]
    ok &= jax.vmap(lambda b: box_ops.small_box_mask(b, 1e-2))(cls_boxes)

    keep = jax.vmap(
        lambda b, s, v: nms_keep(b, s, cfg.nms_thresh, valid=v)
    )(cls_boxes, cls_scores, ok)

    flat_scores = jnp.where((keep & ok).reshape(-1),
                            cls_scores.reshape(-1), NEG_INF)
    d = cfg.detections_per_image
    top_scores, idx = jax.lax.top_k(flat_scores, d)
    valid = top_scores > NEG_INF / 2
    out_boxes = cls_boxes.reshape(-1, 4)[idx]
    out_labels = (idx // p + 1).astype(jnp.int32)
    return (jnp.where(valid[:, None], out_boxes, 0.0),
            jnp.where(valid, top_scores, 0.0),
            jnp.where(valid, out_labels, 0),
            valid)


def pool_rois(
    flat_feats: jnp.ndarray,
    geom: dict,
    rois: jnp.ndarray,
    cfg: ModelConfig,
    pool_size: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-level RoIAlign over the box-head levels, one image."""
    return multilevel_roi_align(
        flat_feats, geom, rois,
        strides=cfg.roi_strides,
        output_size=pool_size or cfg.roi_pool_size,
        sampling_ratio=cfg.roi_sampling_ratio,
        canonical_scale=cfg.roi_canonical_scale,
        canonical_level=cfg.roi_canonical_level,
    )


def pool_rois_batched(
    pyramid: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    cfg: ModelConfig,
    pool_size: Optional[int] = None,
) -> jnp.ndarray:
    """Batched multi-level RoIAlign: Pallas kernel on TPU, XLA elsewhere.

    Args:
      pyramid: the box-head level maps ``[B, Hl, Wl, C]`` (P2..P5 for the
        FPN model; the single map for single-level backbones).
      rois: ``[B, K, 4]``.
    Returns ``[B, K, P, P, C]``.
    """
    import jax as _jax

    size = pool_size or cfg.roi_pool_size
    n_lvl = len(cfg.roi_strides)
    use_pallas = cfg.use_pallas_roi_align and _jax.default_backend() == "tpu"
    if use_pallas:
        # The level-bump in assign_levels guarantees in-window sampling
        # ONLY when the coarsest level itself fits the kernel's VMEM
        # window (true at the production <=1024 canvas).  On bigger
        # canvases (giant spatial tiles) a near-canvas box capped at the
        # coarsest level would have its sample points clamped — silently
        # different features from the XLA path — so fall back.
        from podtpu.ops.pallas.roi_align_kernel import (DEFAULT_WIN,
                                                        window_dims)
        win_h, win_w = window_dims(DEFAULT_WIN)
        ch, cw = pyramid[n_lvl - 1].shape[1:3]
        if ch > win_h or cw > win_w:
            import warnings
            warnings.warn(
                f"pool_rois_batched: coarsest level {ch}x{cw} exceeds the "
                f"Pallas RoIAlign window {win_h}x{win_w}; using the XLA "
                "path (near-canvas boxes would otherwise pool clamped "
                "features).", RuntimeWarning, stacklevel=2)
            use_pallas = False
    if use_pallas:
        from podtpu.ops.pallas.roi_align_kernel import batched_roi_align_pallas

        return batched_roi_align_pallas(
            tuple(pyramid[:n_lvl]), rois, cfg.roi_strides,
            output_size=size,
            sampling_ratio=cfg.roi_sampling_ratio,
            canonical_scale=cfg.roi_canonical_scale,
            canonical_level=cfg.roi_canonical_level,
        )
    from podtpu.ops.roi_align import flatten_levels

    flat, geom = flatten_levels(list(pyramid[:n_lvl]))
    return jax.vmap(
        lambda f, r: pool_rois(f, geom, r, cfg, pool_size=size)
    )(flat, rois)


def mask_loss(
    mask_logits: jnp.ndarray,   # [S, M, M, C]
    rois: SampledRois,
    gt_masks_flat: jnp.ndarray,  # [HW_mask, G] flattened per-gt bitmaps
    mask_geom: dict,
    mask_stride: int,
    cfg: ModelConfig,
) -> jnp.ndarray:
    """BCE mask loss on positive RoIs (torchvision ``maskrcnn_loss``
    semantics: gt bitmap cropped to the RoI and resampled to the mask
    resolution)."""
    m = cfg.mask_resolution
    # Crop each positive RoI's matched gt bitmap to [m, m] via roi_align on
    # the (single-channel) mask plane (memory-bounded: one plane per RoI).
    def crop(roi, gt_idx):
        plane = gt_masks_flat[:, gt_idx][:, None]  # [HW_mask, 1]
        return multilevel_roi_align(
            plane, mask_geom, roi[None], strides=(mask_stride,),
            output_size=m, sampling_ratio=2)[0, :, :, 0]

    targets = jax.vmap(crop)(rois.boxes, rois.gt_index)  # [S, m, m]
    # Mask head emits num_classes channels (channel 0 = background, unused),
    # matching torchvision's MaskRCNNPredictor; pick each RoI's gt class.
    picked = jnp.take_along_axis(
        mask_logits, rois.cls_targets[:, None, None, None], axis=-1)[..., 0]
    bce = (jnp.maximum(picked, 0) - picked * (targets > 0.5)
           + jnp.log1p(jnp.exp(-jnp.abs(picked))))
    pw = (rois.is_pos & rois.valid).astype(jnp.float32)
    denom = jnp.maximum(pw.sum() * m * m, 1.0)
    return jnp.sum(bce * pw[:, None, None]) / denom
