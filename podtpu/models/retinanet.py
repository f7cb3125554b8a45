"""RetinaNet (Flax linen): one-stage focal-loss detector.

TPU-native equivalent of torchvision's ``retinanet_resnet50_fpn`` — the
single-stage family the reference's vendored trainer exposes through
``torchvision.models.detection.__dict__[args.model]``
(`miso/object_detection/engine/train.py:219-221`).  Shares the framework's
ResNet-50 backbone, FPN (P3..P7 via the ``p6p7`` extra), compile-time
anchors, IoU matcher, box coder, and NMS with the Faster R-CNN family;
what is new here is the shared 4-conv class/box subnets, sigmoid focal
loss over all anchors, and the single-pass class-offset NMS postprocess.

TPU-first notes:
* anchors (9 per location over 5 levels) are compile-time constants;
* the loss runs over ALL ~196k anchors with validity masks — no dynamic
  shapes (focal loss needs no sampling, unlike the RPN's balanced 256);
* candidate selection is a static per-level top-k (approx_max_k on TPU),
  merged and re-topped to ``retinanet_nms_candidates`` so the final
  class-offset NMS fits the Pallas kernel's box cap;
* the head applies the SAME submodules to every level (Flax reuse =
  torchvision's shared-weights subnets).

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
from flax import linen as nn

from podtpu.core.config import ModelConfig
from podtpu.models.fpn import FPN
from podtpu.models.resnet import ResNet
from podtpu.models.roi_heads import Detections
from podtpu.ops import boxes as box_ops
from podtpu.ops import matching
from podtpu.ops.anchors import grid_anchors
from podtpu.ops import nms
from podtpu.ops.nms import NEG_INF


class RetinaNetHead(nn.Module):
    """Shared classification + regression subnets (4x conv256 each).

    The final classification conv's bias is initialised to
    ``-log((1-p)/p)`` with prior p=0.01 (the focal-loss paper / torchvision
    ``RetinaNetClassificationHead``) so early training isn't swamped by
    background gradients.  ``norm=True`` adds GroupNorm(32) after each
    tower conv (torchvision ``retinanet_resnet50_fpn_v2``).
    """

    num_anchors: int
    num_classes: int
    channels: int = 256
    norm: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        conv = lambda f, name, bias_init=nn.initializers.zeros, bias=True: \
            nn.Conv(
                f, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                param_dtype=jnp.float32, use_bias=bias,
                kernel_init=nn.initializers.normal(0.01),
                bias_init=bias_init, name=name)
        # epsilon matches torch nn.GroupNorm (1e-5; flax defaults 1e-6) so
        # imported v2 checkpoints normalise identically.
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5,
                                       dtype=self.dtype,
                                       param_dtype=jnp.float32, name=name)
        self.cls_convs = [conv(self.channels, f"cls_conv{i}",
                               bias=not self.norm) for i in range(4)]
        self.cls_gns = [gn(f"cls_gn{i}") for i in range(4)] if self.norm \
            else None
        prior = -math.log((1.0 - 0.01) / 0.01)
        self.cls_logits = conv(
            self.num_anchors * self.num_classes, "cls_logits",
            bias_init=nn.initializers.constant(prior))
        self.box_convs = [conv(self.channels, f"box_conv{i}",
                               bias=not self.norm) for i in range(4)]
        self.box_gns = [gn(f"box_gn{i}") for i in range(4)] if self.norm \
            else None
        self.box_deltas = conv(self.num_anchors * 4, "box_deltas")

    def __call__(self, features):
        """[B, Nl, C] logits and [B, Nl, 4] deltas per level (location-
        major, anchor-minor — matching ``grid_anchors`` flattening)."""
        logits, deltas = [], []
        for f in features:
            b = f.shape[0]
            h = f
            for i, c in enumerate(self.cls_convs):
                h = c(h)
                if self.cls_gns is not None:
                    h = self.cls_gns[i](h)
                h = nn.relu(h)
            lg = self.cls_logits(h)
            logits.append(lg.reshape(b, -1, self.num_classes))
            h = f
            for i, c in enumerate(self.box_convs):
                h = c(h)
                if self.box_gns is not None:
                    h = self.box_gns[i](h)
                h = nn.relu(h)
            dl = self.box_deltas(h)
            deltas.append(dl.reshape(b, -1, 4))
        return logits, deltas


def sigmoid_focal_loss(logits, targets, alpha: float, gamma: float):
    """Elementwise sigmoid focal loss (torchvision ``sigmoid_focal_loss``
    semantics, 'none' reduction)."""
    from podtpu.models.rpn import optax_sigmoid_bce

    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_bce(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        a_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = a_t * loss
    return loss


class RetinaNet(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        self.backbone = ResNet(
            stage_sizes=(3, 4, 6, 3), dtype=dtype,
            trainable_stages=cfg.trainable_backbone_stages,
            stem_space_to_depth=cfg.stem_space_to_depth, name="backbone")
        self.fpn = FPN(out_channels=cfg.fpn_channels, dtype=dtype,
                       extra="p6p7", first_level=3,
                       p6_on_c5=cfg.retinanet_p6_on_c5, name="fpn")
        self.head = RetinaNetHead(
            num_anchors=cfg.anchors_per_location,
            num_classes=cfg.num_classes, channels=cfg.fpn_channels,
            norm=cfg.retinanet_head_norm, dtype=dtype, name="head")

    def _anchors(self):
        cfg = self.cfg
        grids = grid_anchors(tuple(cfg.image_size), tuple(cfg.strides),
                             tuple(cfg.anchor_sizes),
                             tuple(cfg.anchor_ratios))
        return [jnp.asarray(g) for g in grids]

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
        cfg = self.cfg
        pyramid = self._features(images)
        level_logits, level_deltas = self.head(pyramid)
        level_anchors = self._anchors()

        if train:
            assert gt is not None
            return self._losses(level_logits, level_deltas,
                                jnp.concatenate(level_anchors, axis=0), gt)
        return self._postprocess(level_logits, level_deltas, level_anchors)

    # -- training -----------------------------------------------------------
    def _losses(self, level_logits, level_deltas, all_anchors, gt):
        cfg = self.cfg
        logits = jnp.concatenate(level_logits, axis=1)  # [B, N, C]
        deltas = jnp.concatenate(level_deltas, axis=1)  # [B, N, 4]
        img_w = gt.get("image_weight")

        def per_image(logits_i, deltas_i, gt_b, gt_l, gt_v):
            iou = box_ops.box_iou(all_anchors, gt_b)
            m = matching.match(iou, gt_v, cfg.retinanet_fg_iou,
                               cfg.retinanet_bg_iou, allow_low_quality=True)
            fg = (m.labels == 1).astype(jnp.float32)       # [N]
            considered = (m.labels >= 0).astype(jnp.float32)  # not ignored
            # One-hot class target at the matched gt's 1-based label;
            # background anchors target all-zeros (torchvision: channel 0
            # exists but is never set).
            cls = gt_l[m.matched_idx]                      # [N]
            tgt = jax.nn.one_hot(cls, cfg.num_classes) * fg[:, None]
            fl = sigmoid_focal_loss(logits_i.astype(jnp.float32), tgt,
                                    cfg.focal_alpha, cfg.focal_gamma)
            cls_loss = (fl.sum(-1) * considered).sum()
            # Box regression on foreground anchors: L1 on encoded deltas
            # (v1 default) or GIoU on decoded boxes (the v2 recipe's
            # ``_loss_type = 'giou'``).
            if cfg.retinanet_box_loss == "giou":
                pred = box_ops.decode_boxes(
                    deltas_i.astype(jnp.float32), all_anchors)
                giou = box_ops.elementwise_giou(pred, gt_b[m.matched_idx])
                box_loss = ((1.0 - giou) * fg).sum()
            else:
                enc = box_ops.encode_boxes(gt_b[m.matched_idx], all_anchors)
                l1 = jnp.abs(deltas_i.astype(jnp.float32) - enc).sum(-1)
                box_loss = (l1 * fg).sum()
            return cls_loss, box_loss, fg.sum()

        cls_sums, box_sums, num_fg = jax.vmap(per_image)(
            logits, deltas, gt["boxes"], gt["labels"], gt["valid"])
        if img_w is not None:
            cls_sums = cls_sums * img_w
            box_sums = box_sums * img_w
            num_fg = num_fg * img_w
        denom = jnp.maximum(num_fg.sum(), 1.0)
        return {
            "classification": cls_sums.sum() / denom,
            "bbox_regression": box_sums.sum() / denom,
        }

    # -- inference ----------------------------------------------------------
    def _postprocess(self, level_logits, level_deltas, level_anchors):
        cfg = self.cfg
        b = level_logits[0].shape[0]
        k_lvl = cfg.retinanet_topk_per_level

        def per_image(flat_logits, flat_deltas):
            cand_boxes, cand_scores, cand_labels = [], [], []
            off = 0
            for anchors in level_anchors:
                n = anchors.shape[0]
                lg = flat_logits[off: off + n].astype(jnp.float32)
                dl = flat_deltas[off: off + n].astype(jnp.float32)
                off += n
                # Per-level top-k over (anchor, class) pairs, background
                # channel excluded (torchvision keeps 1000 per level).
                sc = jax.nn.sigmoid(lg[:, 1:]).reshape(-1)  # [n*(C-1)]
                k = min(k_lvl, sc.shape[0])
                top, idx = matching.topk_maybe_approx(sc, k,
                                                      cfg.approx_topk)
                a_idx = idx // (cfg.num_classes - 1)
                c_idx = idx % (cfg.num_classes - 1) + 1
                bx = box_ops.decode_boxes(dl[a_idx], anchors[a_idx])
                cand_boxes.append(box_ops.clip_boxes(bx, cfg.image_size))
                cand_scores.append(top)
                cand_labels.append(c_idx.astype(jnp.int32))
            boxes = jnp.concatenate(cand_boxes, axis=0)
            scores = jnp.concatenate(cand_scores, axis=0)
            labels = jnp.concatenate(cand_labels, axis=0)
            ok = scores > cfg.score_thresh
            ok &= box_ops.small_box_mask(boxes, 1e-2)
            # Merge-pool re-top keeps the NMS static: the default pool
            # covers every per-level survivor (torchvision semantics) and
            # stays inside the Pallas NMS kernel's 8192-box cap.
            pool = min(cfg.retinanet_nms_candidates, scores.shape[0])
            msc = jnp.where(ok, scores, NEG_INF)
            top, idx = jax.lax.top_k(msc, pool)
            boxes, scores, labels = boxes[idx], top, labels[idx]
            valid = scores > NEG_INF / 2
            # Class-aware single-pass NMS (shared coordinate-offset
            # helper, torchvision ``batched_nms`` semantics).
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
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(per_image)(
            logits, deltas)
        return Detections(boxes=det_boxes, scores=det_scores,
                          labels=det_labels, valid=det_valid)
