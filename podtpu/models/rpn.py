"""Region Proposal Network (Flax linen), static-shape TPU design.

TPU-native equivalent of the RPN inside torchvision's
``fasterrcnn_resnet50_fpn`` (reference `miso/object_detection/models.py:8`;
call stack SURVEY.md §3.1: "RPN(anchors, objectness, proposal NMS)").

Semantics mirror torchvision: shared 3x3 conv head over all FPN levels,
per-level pre-NMS top-k, per-level NMS at 0.7, global post-NMS top-k;
training targets via IoU matcher (0.7/0.3, low-quality matches allowed) and a
256-anchor 50%-positive balanced sample; BCE objectness + smooth-L1 (beta=1/9)
box loss normalized by the total sampled count.

TPU-first: every stage is fixed-shape (top-k + validity masks), NMS is the
fixpoint-iteration kernel from podtpu.ops.nms vmapped over levels, and the
whole thing vmaps over the batch.
"""
from __future__ import annotations

from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from podtpu.core.config import ModelConfig
from podtpu.ops import boxes as box_ops
from podtpu.ops import matching
from podtpu.ops.nms import NEG_INF, nms_keep


class RPNHead(nn.Module):
    """Shared conv head: objectness + box deltas for every FPN level.

    ``conv_depth`` > 1 stacks extra 3x3 convs before the predictors
    (torchvision ``RPNHead(conv_depth=2)``, the v2 recipe).
    """

    num_anchors: int
    channels: int = 256
    conv_depth: int = 1
    dtype: Any = jnp.bfloat16
    # Pack the coarse levels into ONE canvas before the convs (exact math;
    # see _packed_apply).  The finest level always runs alone.
    pack_levels: bool = False

    def setup(self):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        conv = lambda name: nn.Conv(self.channels, (3, 3),
                                    padding=[(1, 1), (1, 1)], name=name,
                                    **kw)
        # First conv keeps the v1 name 'conv' (checkpoint compatibility).
        self.convs = [conv("conv" if i == 0 else f"conv{i + 1}")
                      for i in range(self.conv_depth)]
        self.objectness = nn.Conv(self.num_anchors, (1, 1), name="objectness",
                                  **kw)
        self.deltas = nn.Conv(self.num_anchors * 4, (1, 1), name="deltas", **kw)

    def _head(self, h):
        for c in self.convs:
            h = nn.relu(c(h))
        return self.objectness(h), self.deltas(h)

    def _packed_apply(self, features):
        """Apply the head to several levels as ONE conv over a packed
        canvas (exact math, not an approximation).

        Levels are stacked along height, left-aligned, with a 1-row zero
        gap between them: a 3x3 SAME conv then reads, at every level-edge
        output, exactly the zeros its own padding would have supplied —
        so slicing the level regions back out reproduces the per-level
        convs bit-for-bit (up to dtype rounding order).  Small FPN grids
        (16², 8²...) tile the MXU poorly on their own; one tall canvas
        amortises the conv.  For conv_depth > 1 the gap/garbage regions
        are re-zeroed between convs so the second conv also reads zeros.
        """
        b, _, _, c = features[0].shape
        heights = [f.shape[1] for f in features]
        widths = [f.shape[2] for f in features]
        wmax = max(widths)
        total_h = sum(heights) + len(features) - 1
        offsets = []
        o = 0
        for h in heights:
            offsets.append(o)
            o += h + 1
        canvas = jnp.zeros((b, total_h, wmax, c), features[0].dtype)
        for f, off, w in zip(features, offsets, widths):
            canvas = jax.lax.dynamic_update_slice(canvas, f, (0, off, 0, 0))
        if self.conv_depth > 1:
            import numpy as np
            mask = np.zeros((total_h, wmax, 1), np.float32)
            for off, h, w in zip(offsets, heights, widths):
                mask[off:off + h, :w] = 1.0
            mask = jnp.asarray(mask, features[0].dtype)
            h = canvas
            for ci, cv in enumerate(self.convs):
                h = nn.relu(cv(h))
                if ci + 1 < self.conv_depth:
                    h = h * mask
            obj, dlt = self.objectness(h), self.deltas(h)
        else:
            obj, dlt = self._head(canvas)
        outs = []
        for off, hh, w in zip(offsets, heights, widths):
            outs.append((
                jax.lax.dynamic_slice(
                    obj, (0, off, 0, 0), (b, hh, w, obj.shape[-1])),
                jax.lax.dynamic_slice(
                    dlt, (0, off, 0, 0), (b, hh, w, dlt.shape[-1])),
            ))
        return outs

    def __call__(self, features: Sequence[jnp.ndarray]):
        """Returns per-level flattened (logits [B, Hl*Wl*A], deltas
        [B, Hl*Wl*A, 4]) in anchor-grid order (y, x, A).

        Outputs stay in the compute dtype (bf16): casting the FULL anchor
        grids to f32 here cost ~2 ms/step in layout copies; consumers cast
        the few thousand gathered entries instead.
        """
        if self.pack_levels and len(features) >= 3:
            level_outs = [self._head(features[0])]
            level_outs += self._packed_apply(list(features[1:]))
        else:
            level_outs = [self._head(f) for f in features]
        logits, deltas = [], []
        for obj, dlt in level_outs:
            b = obj.shape[0]
            logits.append(obj.reshape(b, -1))
            deltas.append(dlt.reshape(b, -1, 4))
        return logits, deltas


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # [B, P, 4]
    scores: jnp.ndarray  # [B, P] objectness logits
    valid: jnp.ndarray   # [B, P]


def select_proposals(
    level_logits: List[jnp.ndarray],
    level_deltas: List[jnp.ndarray],
    level_anchors: Sequence[jnp.ndarray],
    cfg: ModelConfig,
    train: bool,
) -> Proposals:
    """Decode + filter RPN outputs into a fixed number of proposals."""
    pre_k = cfg.rpn_pre_nms_topk_train if train else cfg.rpn_pre_nms_topk_test
    post_k = cfg.rpn_post_nms_topk_train if train else cfg.rpn_post_nms_topk_test
    h, w = cfg.image_size

    def per_image(logits_l, deltas_l):
        # --- per level: top-k, decode, clip, size filter ------------------
        cand_boxes, cand_scores, cand_valid = [], [], []
        for logits, deltas, anchors in zip(logits_l, deltas_l, level_anchors):
            kl = min(pre_k, logits.shape[0])
            top_scores, idx = matching.topk_maybe_approx(
                logits, kl, cfg.approx_topk)
            # Gather first, cast the 2000-entry result (not the full grid).
            top_scores = top_scores.astype(jnp.float32)
            boxes = box_ops.decode_boxes(
                deltas[idx].astype(jnp.float32), anchors[idx])
            boxes = box_ops.clip_boxes(boxes, (h, w))
            ok = box_ops.small_box_mask(boxes, cfg.rpn_min_size)
            if cfg.rpn_score_thresh > 0.0:
                # torchvision GeneralizedRCNN rpn_score_thresh: drop
                # low-objectness proposals before NMS (the 320_fpn
                # recipe's 0.05).  Compare in logit space.
                import math as _math
                t = float(cfg.rpn_score_thresh)
                ok &= top_scores > _math.log(t / (1.0 - t))
            cand_boxes.append(boxes)
            cand_scores.append(top_scores)
            cand_valid.append(ok)
        # Pad levels with fewer anchors than pre_k (e.g. P6) to a common K
        # so levels stack for one vmapped NMS.
        kmax = max(b.shape[0] for b in cand_boxes)
        cand_boxes = [jnp.pad(b, ((0, kmax - b.shape[0]), (0, 0)))
                      for b in cand_boxes]
        cand_scores = [jnp.pad(s, (0, kmax - s.shape[0]),
                               constant_values=NEG_INF) for s in cand_scores]
        cand_valid = [jnp.pad(v, (0, kmax - v.shape[0])) for v in cand_valid]
        boxes = jnp.stack(cand_boxes)     # [L, K, 4]
        scores = jnp.stack(cand_scores)   # [L, K]
        valid = jnp.stack(cand_valid) & (scores > NEG_INF / 2)

        # --- per-level NMS (vmapped), then global top-k -------------------
        keep = jax.vmap(
            lambda b, s, v: nms_keep(b, s, cfg.rpn_nms_thresh, valid=v)
        )(boxes, scores, valid)
        flat_scores = jnp.where((keep & valid).reshape(-1),
                                scores.reshape(-1), NEG_INF)
        top_scores, idx = jax.lax.top_k(flat_scores, post_k)
        out_valid = top_scores > NEG_INF / 2
        out_boxes = boxes.reshape(-1, 4)[idx]
        return (jnp.where(out_valid[:, None], out_boxes, 0.0),
                jnp.where(out_valid, top_scores, 0.0),
                out_valid)

    b, s, v = jax.vmap(per_image)(list(level_logits), list(level_deltas))
    return Proposals(boxes=b, scores=s, valid=v)


def rpn_losses(
    rng: jax.Array,
    level_logits: List[jnp.ndarray],
    level_deltas: List[jnp.ndarray],
    all_anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    cfg: ModelConfig,
    img_weight: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RPN objectness + box losses, batch-normalised like torchvision
    (sum over sampled anchors across the batch / total sampled).

    TPU note: after matching (a fused [num_anchors, G] broadcast — a scan
    formulation measured 10x slower), everything runs on the GATHERED 256
    sampled anchors per image; no full-anchor encode/BCE/scatter.
    """
    logits = jnp.concatenate(level_logits, axis=1)   # [B, N]
    deltas = jnp.concatenate(level_deltas, axis=1)   # [B, N, 4]
    batch = logits.shape[0]

    def per_image(rng_i, logits_i, deltas_i, gt_b, gt_v):
        iou = box_ops.box_iou(all_anchors, gt_b)
        m = matching.match(iou, gt_v, cfg.rpn_fg_iou, cfg.rpn_bg_iou,
                           allow_low_quality=True)
        samp = matching.balanced_sample_gather(
            rng_i, m.labels, jnp.ones(all_anchors.shape[0], bool),
            cfg.rpn_batch_per_image, cfg.rpn_positive_fraction,
            approx=cfg.approx_topk)
        # Gather the 256 sampled entries, THEN cast (the head emits bf16).
        sel_logits = logits_i[samp.idx].astype(jnp.float32)
        sel_deltas = deltas_i[samp.idx].astype(jnp.float32)
        sel_anchors = all_anchors[samp.idx]
        sel_gt = gt_b[m.matched_idx[samp.idx]]
        targets = box_ops.encode_boxes(sel_gt, sel_anchors)
        w = samp.valid.astype(jnp.float32)
        pw = (samp.is_pos & samp.valid).astype(jnp.float32)
        obj = optax_sigmoid_bce(sel_logits, pw) * w
        l1 = smooth_l1(sel_deltas - targets, beta=1.0 / 9.0).sum(-1) * pw
        return obj.sum(), l1.sum(), w.sum()

    rngs = jax.random.split(rng, batch)
    obj_sums, box_sums, counts = jax.vmap(per_image)(
        rngs, logits, deltas, gt_boxes, gt_valid)
    if img_weight is not None:
        # Zero out wrap-around duplicate images (loader batch_valid mask).
        obj_sums = obj_sums * img_weight
        box_sums = box_sums * img_weight
        counts = counts * img_weight
    total = jnp.maximum(counts.sum(), 1.0)
    return obj_sums.sum() / total, box_sums.sum() / total


def smooth_l1(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * x * x / beta, ax - 0.5 * beta)


def optax_sigmoid_bce(logits, labels):
    # log(1 + exp(-|x|)) formulation for stability.
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
