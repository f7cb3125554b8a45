"""FCOS (Flax linen): anchor-free one-stage detector.

TPU-native equivalent of torchvision's ``fcos_resnet50_fpn`` — another
torchvision-zoo family the reference's vendored trainer exposes through
``torchvision.models.detection.__dict__[args.model]``
(`miso/object_detection/engine/train.py:219-221`).  Shares the framework's
ResNet-50 backbone, the P3..P7 FPN (``p6p7`` extra), the compile-time
anchor grids, the sigmoid focal loss, and the class-offset NMS with the
RetinaNet family; what is new here is the anchor-free target assignment
(centre sampling + per-level scale ranges instead of IoU matching), the
linear (l, t, r, b) box coder, the GIoU regression loss, and the
centre-ness branch whose sigmoid multiplies the classification score.

TPU-first notes:
* the "anchors" are one stride-sized cell box per grid point — a pure
  compile-time constant; matching is a dense ``[N, M]`` mask build
  (~22k locations x max_gt at the 1024 canvas), fully vectorised — no
  per-gt loops, no dynamic shapes;
* every loss term is computed over ALL locations and masked by the
  foreground mask (sums, not gathers), so the whole train step is one
  static XLA program;
* the heads apply the SAME submodules to every level (Flax reuse =
  torchvision's shared subnets with GroupNorm).

Interface-compatible with the rest of the framework: train -> loss dict
(summed by the epoch engine), eval -> ``roi_heads.Detections`` — so
``train()``, ``infer()``, ``infer_tiled()``, the server, and COCO
evaluation work unchanged.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from podtpu.core.config import ModelConfig
from podtpu.models.fpn import FPN
from podtpu.models.resnet import ResNet
from podtpu.models.retinanet import sigmoid_focal_loss
from podtpu.models.roi_heads import Detections
from podtpu.models.rpn import optax_sigmoid_bce
from podtpu.ops import boxes as box_ops
from podtpu.ops import matching
from podtpu.ops import nms
from podtpu.ops.anchors import grid_anchors
from podtpu.ops.nms import NEG_INF


class FCOSHead(nn.Module):
    """Shared classification + regression towers (4x conv256+GroupNorm32
    each; torchvision ``FCOSClassificationHead``/``FCOSRegressionHead``).

    The regression tower ends in two sibling convs: ``box_deltas`` (the
    (l, t, r, b) distances, relu'd non-negative) and ``ctrness`` (one
    centre-ness logit per location).  The final classification conv's bias
    is initialised to ``-log((1-p)/p)`` with prior p=0.01.
    """

    num_classes: int
    channels: int = 256
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        conv = lambda f, name, bias_init=nn.initializers.zeros: nn.Conv(
            f, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=bias_init, name=name)
        # epsilon matches torch nn.GroupNorm (1e-5; flax defaults 1e-6) so
        # imported checkpoints normalise identically.
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                       dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        self.cls_convs = [conv(self.channels, f"cls_conv{i}")
                          for i in range(4)]
        self.cls_gns = [gn(f"cls_gn{i}") for i in range(4)]
        prior = -math.log((1.0 - 0.01) / 0.01)
        self.cls_logits = conv(self.num_classes, "cls_logits",
                               bias_init=nn.initializers.constant(prior))
        self.box_convs = [conv(self.channels, f"box_conv{i}")
                          for i in range(4)]
        self.box_gns = [gn(f"box_gn{i}") for i in range(4)]
        self.box_deltas = conv(4, "box_deltas")
        self.ctrness = conv(1, "ctrness")

    def __call__(self, features):
        """Per level: [B, Nl, C] logits, [B, Nl, 4] non-negative (l,t,r,b)
        codes, [B, Nl] centre-ness logits (location-major flattening,
        matching ``grid_anchors``)."""
        logits, deltas, ctr = [], [], []
        for f in features:
            b = f.shape[0]
            h = f
            for c, g in zip(self.cls_convs, self.cls_gns):
                h = nn.relu(g(c(h)))
            logits.append(self.cls_logits(h).reshape(b, -1,
                                                     self.num_classes))
            h = f
            for c, g in zip(self.box_convs, self.box_gns):
                h = nn.relu(g(c(h)))
            # torchvision FCOSRegressionHead relu's the distances.
            deltas.append(nn.relu(self.box_deltas(h)).reshape(b, -1, 4))
            ctr.append(self.ctrness(h).reshape(b, -1))
        return logits, deltas, ctr


def fcos_match(anchors: jnp.ndarray, sizes: jnp.ndarray,
               lower: jnp.ndarray, upper: jnp.ndarray,
               gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray,
               center_radius: float) -> jnp.ndarray:
    """FCOS ground-truth assignment for one image -> ``[N]`` matched gt
    index (-1 = background).

    Torchvision ``FCOS.compute_loss`` semantics: a location matches a gt
    when (a) its centre is within ``center_radius * level_size`` of the gt
    centre (centre sampling), (b) it lies strictly inside the gt box, and
    (c) the largest side distance falls in the level's scale range
    ``(4*size, 8*size)`` (first level's lower bound 0, last level's upper
    bound inf — precomputed in ``lower``/``upper``).  Ties go to the gt
    with the smallest area.
    """
    acx = 0.5 * (anchors[:, 0] + anchors[:, 2])   # [N]
    acy = 0.5 * (anchors[:, 1] + anchors[:, 3])
    gcx = 0.5 * (gt_boxes[:, 0] + gt_boxes[:, 2])  # [M]
    gcy = 0.5 * (gt_boxes[:, 1] + gt_boxes[:, 3])
    off = jnp.maximum(jnp.abs(acx[:, None] - gcx[None, :]),
                      jnp.abs(acy[:, None] - gcy[None, :]))  # [N, M]
    match = off < center_radius * sizes[:, None]

    l = acx[:, None] - gt_boxes[None, :, 0]
    t = acy[:, None] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - acx[:, None]
    b = gt_boxes[None, :, 3] - acy[:, None]
    dmin = jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b))
    dmax = jnp.maximum(jnp.maximum(l, t), jnp.maximum(r, b))
    match &= dmin > 0
    match &= (dmax > lower[:, None]) & (dmax < upper[:, None])
    match &= gt_valid[None, :]

    # Min-area tiebreak (torchvision: score = match * (1e8 - area)).
    area = box_ops.box_area(gt_boxes)
    score = match.astype(jnp.float32) * (1e8 - area[None, :])
    best = jnp.max(score, axis=1)
    idx = jnp.argmax(score, axis=1).astype(jnp.int32)
    return jnp.where(best < 1e-5, -1, idx)


class FCOS(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        self.backbone = ResNet(
            stage_sizes=(3, 4, 6, 3), dtype=dtype,
            trainable_stages=cfg.trainable_backbone_stages,
            stem_space_to_depth=cfg.stem_space_to_depth, name="backbone")
        self.fpn = FPN(out_channels=cfg.fpn_channels, dtype=dtype,
                       extra="p6p7", first_level=3, name="fpn")
        self.head = FCOSHead(num_classes=cfg.num_classes,
                             channels=cfg.fpn_channels, dtype=dtype,
                             name="head")

    def _anchors(self):
        cfg = self.cfg
        grids = grid_anchors(tuple(cfg.image_size), tuple(cfg.strides),
                             tuple(cfg.anchor_sizes),
                             tuple(cfg.anchor_ratios))
        return [jnp.asarray(g) for g in grids]

    def _level_constants(self):
        """Per-location (size, scale-range) vectors over the concatenated
        levels — compile-time constants, like the anchors themselves."""
        cfg = self.cfg
        grids = grid_anchors(tuple(cfg.image_size), tuple(cfg.strides),
                             tuple(cfg.anchor_sizes),
                             tuple(cfg.anchor_ratios))
        sizes, lower, upper = [], [], []
        n_levels = len(grids)
        for li, g in enumerate(grids):
            n = g.shape[0]
            s = float(np.asarray(g[0, 2] - g[0, 0]))  # cell size == stride
            sizes.append(np.full((n,), s, np.float32))
            lower.append(np.full(
                (n,), 0.0 if li == 0 else 4.0 * s, np.float32))
            upper.append(np.full(
                (n,), np.inf if li == n_levels - 1 else 8.0 * s,
                np.float32))
        return (jnp.asarray(np.concatenate(sizes)),
                jnp.asarray(np.concatenate(lower)),
                jnp.asarray(np.concatenate(upper)))

    def _features(self, images):
        cfg = self.cfg
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(cfg.pixel_std, jnp.float32)
        x = (images - mean) / std
        c2, c3, c4, c5 = self.backbone(x)
        return self.fpn((c3, c4, c5))  # P3..P7

    def __call__(self, images, gt=None, train: bool = False,
                 rng: Optional[jax.Array] = None):
        pyramid = self._features(images)
        level_logits, level_deltas, level_ctr = self.head(pyramid)
        level_anchors = self._anchors()

        if train:
            assert gt is not None
            return self._losses(level_logits, level_deltas, level_ctr,
                                jnp.concatenate(level_anchors, axis=0), gt)
        return self._postprocess(level_logits, level_deltas, level_ctr,
                                 level_anchors)

    # -- training -----------------------------------------------------------
    def _losses(self, level_logits, level_deltas, level_ctr, all_anchors,
                gt):
        cfg = self.cfg
        logits = jnp.concatenate(level_logits, axis=1)  # [B, N, C]
        deltas = jnp.concatenate(level_deltas, axis=1)  # [B, N, 4]
        ctr = jnp.concatenate(level_ctr, axis=1)        # [B, N]
        sizes, lower, upper = self._level_constants()
        img_w = gt.get("image_weight")

        def per_image(logits_i, deltas_i, ctr_i, gt_b, gt_l, gt_v):
            m = fcos_match(all_anchors, sizes, lower, upper, gt_b, gt_v,
                           cfg.fcos_center_radius)
            fg = (m >= 0).astype(jnp.float32)  # [N]
            safe = jnp.maximum(m, 0)
            # Classification: one-hot at the matched gt's 1-based label for
            # foreground, all-zeros for background; focal loss over ALL
            # locations (FCOS has no ignore band).
            tgt = jax.nn.one_hot(gt_l[safe], cfg.num_classes) * fg[:, None]
            fl = sigmoid_focal_loss(logits_i.astype(jnp.float32), tgt,
                                    cfg.focal_alpha, cfg.focal_gamma)
            cls_loss = fl.sum()
            # Regression: GIoU between the decoded boxes and the matched gt
            # on foreground locations (torchvision: pure GIoU, no L1).
            pred = box_ops.decode_boxes_linear(
                deltas_i.astype(jnp.float32), all_anchors)
            giou = box_ops.elementwise_giou(pred, gt_b[safe])
            box_loss = ((1.0 - giou) * fg).sum()
            # Centre-ness: BCE against sqrt((min/max l,r) * (min/max t,b))
            # of the ENCODED gt distances, foreground only.  eps-guarded:
            # background rows hold garbage that must stay NaN-free.
            enc = box_ops.encode_boxes_linear(all_anchors, gt_b[safe])
            lr_min = jnp.minimum(enc[:, 0], enc[:, 2])
            lr_max = jnp.maximum(enc[:, 0], enc[:, 2])
            tb_min = jnp.minimum(enc[:, 1], enc[:, 3])
            tb_max = jnp.maximum(enc[:, 1], enc[:, 3])
            ratio = (lr_min / jnp.maximum(lr_max, 1e-6)) \
                * (tb_min / jnp.maximum(tb_max, 1e-6))
            ctr_tgt = jnp.sqrt(jnp.clip(ratio, 0.0))
            ctr_loss = (optax_sigmoid_bce(ctr_i.astype(jnp.float32),
                                          ctr_tgt) * fg).sum()
            return cls_loss, box_loss, ctr_loss, fg.sum()

        cls_s, box_s, ctr_s, num_fg = jax.vmap(per_image)(
            logits, deltas, ctr, gt["boxes"], gt["labels"], gt["valid"])
        if img_w is not None:
            cls_s, box_s = cls_s * img_w, box_s * img_w
            ctr_s, num_fg = ctr_s * img_w, num_fg * img_w
        denom = jnp.maximum(num_fg.sum(), 1.0)
        return {
            "classification": cls_s.sum() / denom,
            "bbox_regression": box_s.sum() / denom,
            "bbox_ctrness": ctr_s.sum() / denom,
        }

    # -- inference ----------------------------------------------------------
    def _postprocess(self, level_logits, level_deltas, level_ctr,
                     level_anchors):
        """Same per-level top-k + merged class-offset NMS structure as the
        RetinaNet postprocess; the score is
        ``sqrt(sigmoid(cls) * sigmoid(ctrness))`` (torchvision FCOS)."""
        cfg = self.cfg
        k_lvl = cfg.retinanet_topk_per_level

        def per_image(flat_logits, flat_deltas, flat_ctr):
            cand_boxes, cand_scores, cand_labels = [], [], []
            off = 0
            for anchors in level_anchors:
                n = anchors.shape[0]
                lg = flat_logits[off: off + n].astype(jnp.float32)
                dl = flat_deltas[off: off + n].astype(jnp.float32)
                ct = flat_ctr[off: off + n].astype(jnp.float32)
                off += n
                # (location, class) top-k, background channel excluded
                # (labels are 1-based; channel 0 is trained to all-zeros).
                sc = jnp.sqrt(jax.nn.sigmoid(lg[:, 1:])
                              * jax.nn.sigmoid(ct)[:, None]).reshape(-1)
                k = min(k_lvl, sc.shape[0])
                top, idx = matching.topk_maybe_approx(sc, k,
                                                      cfg.approx_topk)
                a_idx = idx // (cfg.num_classes - 1)
                c_idx = idx % (cfg.num_classes - 1) + 1
                bx = box_ops.decode_boxes_linear(dl[a_idx], anchors[a_idx])
                cand_boxes.append(box_ops.clip_boxes(bx, cfg.image_size))
                cand_scores.append(top)
                cand_labels.append(c_idx.astype(jnp.int32))
            boxes = jnp.concatenate(cand_boxes, axis=0)
            scores = jnp.concatenate(cand_scores, axis=0)
            labels = jnp.concatenate(cand_labels, axis=0)
            ok = scores > cfg.score_thresh
            ok &= box_ops.small_box_mask(boxes, 1e-2)
            pool = min(cfg.retinanet_nms_candidates, scores.shape[0])
            msc = jnp.where(ok, scores, NEG_INF)
            top, idx = jax.lax.top_k(msc, pool)
            boxes, scores, labels = boxes[idx], top, labels[idx]
            valid = scores > NEG_INF / 2
            keep = nms.batched_nms_keep(boxes, scores, labels,
                                        cfg.nms_thresh, valid=valid)
            d = cfg.detections_per_image
            oidx, out_valid = nms.topk_by_score(scores, keep, d)
            return (jnp.where(out_valid[:, None], boxes[oidx], 0.0),
                    jnp.where(out_valid, scores[oidx], 0.0),
                    jnp.where(out_valid, labels[oidx], 0),
                    out_valid)

        logits = jnp.concatenate(level_logits, axis=1)
        deltas = jnp.concatenate(level_deltas, axis=1)
        ctr = jnp.concatenate(level_ctr, axis=1)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(per_image)(
            logits, deltas, ctr)
        return Detections(boxes=det_boxes, scores=det_scores,
                          labels=det_labels, valid=det_valid)
