"""SSD (Flax linen): single-shot multibox detector, hard-negative mining.

TPU-native equivalent of torchvision's ``SSD`` meta-architecture as
instantiated by ``ssd300_vgg16`` and ``ssdlite320_mobilenet_v3_large`` —
two more of the torchvision-zoo detector families the reference's vendored
trainer dispatches to (`miso/object_detection/engine/train.py:219-221`),
and the families its ``ssd``/``ssdlite`` augmentation presets exist for
(`miso/object_detection/engine/presets.py:30-57`).

Matches torchvision's semantics:
* default boxes from ``DefaultBoxGenerator`` (ops/anchors.py::default_boxes,
  compile-time constants);
* per-level UNSHARED conv heads (unlike RetinaNet's shared subnets);
* ``SSDMatcher``: fg iff IoU >= 0.5, plus each gt FORCES its single
  best-overlap anchor to itself (last gt wins on collisions, the torch
  scatter semantics);
* loss: smooth-L1 (beta 1) box regression on foreground anchors with the
  (10, 10, 5, 5) box coder, softmax cross-entropy with 3:1 hard-negative
  mining, both normalised by the batch-total foreground count;
* postprocess: softmax scores, per-class score-threshold + top-k
  (``ssd_topk_per_class``), merged class-aware NMS, top
  ``detections_per_image``.

TPU-first notes: the hard-negative selection is the double-argsort rank
trick (one static sort over ~8.7k anchors — no dynamic shapes); the
per-class candidate selection unrolls over the STATIC class count and the
merged pool rides the Pallas NMS kernel; everything else is vmapped
per-image over static-capacity arrays.

Interface-compatible with the rest of the framework: train -> loss dict
(summed by the epoch engine), eval -> ``roi_heads.Detections`` — so
``train()``, ``infer()``, ``infer_tiled()``, the server, and COCO
evaluation work unchanged.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from podtpu.core.config import ModelConfig
from podtpu.models.roi_heads import Detections
from podtpu.ops import boxes as box_ops
from podtpu.ops import matching, nms
from podtpu.ops.anchors import default_boxes
from podtpu.ops.nms import NEG_INF

SSD_BOX_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class SSDHead(nn.Module):
    """Per-level 3x3 conv heads (torchvision ``SSDHead``): classification
    ``A_k * C`` and regression ``A_k * 4`` channels, weights NOT shared
    across levels.  ``separable=True`` switches to the SSDLite flavour
    (3x3 depthwise + BN + ReLU6, then 1x1 pointwise)."""

    num_anchors: tuple        # A_k per level
    num_classes: int
    separable: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    def _score_conv(self, out_ch: int, name: str):
        if not self.separable:
            return nn.Conv(out_ch, (3, 3), padding=[(1, 1)] * 2,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=name)

        from podtpu.models.resnet import FrozenBatchNorm

        class _Separable(nn.Module):
            out_ch: int
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, x):
                c = x.shape[-1]
                h = nn.Conv(c, (3, 3), padding=[(1, 1)] * 2,
                            feature_group_count=c, use_bias=False,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name="dw")(x)
                h = FrozenBatchNorm(c, dtype=self.dtype, name="bn")(h)
                h = jnp.minimum(nn.relu(h), 6.0)
                return nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                               param_dtype=jnp.float32, name="pw")(h)

        return _Separable(out_ch=out_ch, dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, features):
        """[B, Nk, C] logits and [B, Nk, 4] deltas per level (location-
        major, anchor-minor — matching ``default_boxes`` flattening)."""
        logits, deltas = [], []
        for k, f in enumerate(features):
            b = f.shape[0]
            a = self.num_anchors[k]
            lg = self._score_conv(a * self.num_classes, f"cls{k}")(f)
            dl = self._score_conv(a * 4, f"reg{k}")(f)
            logits.append(lg.reshape(b, -1, self.num_classes))
            deltas.append(dl.reshape(b, -1, 4))
        return logits, deltas


def match_ssd(iou: jnp.ndarray, gt_valid: jnp.ndarray,
              iou_thresh: float) -> matching.MatchResult:
    """torchvision ``SSDMatcher`` semantics: argmax-gt per anchor with a
    single fg/bg threshold (no ignore band), then each valid gt OVERWRITES
    its best-overlap anchor's assignment with itself.  On collisions (two
    gts sharing a best anchor) the later gt wins — the torch scatter's
    last-write semantics, realised here as a max over gt indices."""
    neg = jnp.full_like(iou, -1.0)
    iou = jnp.where(gt_valid[None, :], iou, neg)
    matched_val = jnp.max(iou, axis=1)
    matched_idx = jnp.argmax(iou, axis=1).astype(jnp.int32)
    labels = jnp.where(matched_val >= iou_thresh, 1, 0)

    n, m = iou.shape
    best_anchor = jnp.argmax(iou, axis=0)  # [M]
    force = ((jnp.arange(n)[:, None] == best_anchor[None, :])
             & gt_valid[None, :] & (jnp.max(iou, axis=0) > 0)[None, :])
    forced_gt = jnp.max(
        jnp.where(force, jnp.arange(m)[None, :], -1), axis=1)  # [N]
    matched_idx = jnp.where(forced_gt >= 0, forced_gt, matched_idx) \
        .astype(jnp.int32)
    labels = jnp.where(forced_gt >= 0, 1, labels)
    labels = jnp.where(jnp.any(gt_valid), labels, 0)
    return matching.MatchResult(matched_idx=matched_idx, labels=labels)


def smooth_l1(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def ssd_losses(logits, deltas, anchors, gt, cfg: ModelConfig):
    """torchvision ``SSD.compute_loss`` semantics over static shapes.

    ``logits [B, N, C]``, ``deltas [B, N, 4]``, ``anchors [N, 4]``; ``gt``
    is the framework's fixed-capacity target dict.  Hard negatives are the
    double-argsort rank trick: sort per-anchor CE descending among
    negatives, keep ranks < 3x the image's foreground count — identical to
    torchvision's sort/sort selection, with every shape static.
    """
    img_w = gt.get("image_weight")

    def per_image(logits_i, deltas_i, gt_b, gt_l, gt_v):
        iou = box_ops.box_iou(anchors, gt_b)
        m = match_ssd(iou, gt_v, cfg.ssd_iou_thresh)
        fg = (m.labels == 1).astype(jnp.float32)  # [N]
        # Box regression: smooth-L1 on encoded targets, fg anchors only.
        enc = box_ops.encode_boxes(gt_b[m.matched_idx], anchors,
                                   weights=SSD_BOX_WEIGHTS)
        reg = smooth_l1(deltas_i.astype(jnp.float32) - enc).sum(-1)
        box_loss = (reg * fg).sum()
        # Classification: CE against the matched class (bg=0), with
        # hard-negative mining by per-anchor loss rank.
        cls_tgt = jnp.where(m.labels == 1, gt_l[m.matched_idx], 0)
        logp = jax.nn.log_softmax(logits_i.astype(jnp.float32), axis=-1)
        ce = -jnp.take_along_axis(logp, cls_tgt[:, None], axis=-1)[:, 0]
        num_fg = fg.sum()
        neg_ce = jnp.where(fg > 0, -jnp.inf, ce)
        order = jnp.argsort(-neg_ce, stable=True)
        rank = jnp.argsort(order, stable=True)  # rank of each anchor
        num_neg = cfg.ssd_neg_pos_ratio * num_fg
        hard_neg = (rank < num_neg) & (fg == 0)
        cls_loss = (ce * fg).sum() + jnp.where(hard_neg, ce, 0.0).sum()
        return cls_loss, box_loss, num_fg

    cls_sums, box_sums, num_fg = jax.vmap(per_image)(
        logits, deltas, gt["boxes"], gt["labels"], gt["valid"])
    if img_w is not None:
        cls_sums = cls_sums * img_w
        box_sums = box_sums * img_w
        num_fg = num_fg * img_w
    n = jnp.maximum(num_fg.sum(), 1.0)
    return {
        "classification": cls_sums.sum() / n,
        "bbox_regression": box_sums.sum() / n,
    }


def ssd_postprocess(logits, deltas, anchors, cfg: ModelConfig) -> Detections:
    """torchvision ``SSD.postprocess_detections`` semantics: softmax
    scores, per-class score-threshold + top-k candidates (class count is
    static, so the class loop unrolls), one merged class-aware NMS, top
    ``detections_per_image``."""
    k_cls = min(cfg.ssd_topk_per_class, anchors.shape[0])

    def per_image(logits_i, deltas_i):
        scores = jax.nn.softmax(logits_i.astype(jnp.float32), axis=-1)
        boxes = box_ops.decode_boxes(deltas_i.astype(jnp.float32),
                                     anchors, weights=SSD_BOX_WEIGHTS)
        boxes = box_ops.clip_boxes(boxes, cfg.image_size)
        # Regression is class-agnostic, so decoded boxes are shared and
        # only scores select per class.
        cand_boxes, cand_scores, cand_labels = [], [], []
        for c in range(1, cfg.num_classes):
            sc = jnp.where(scores[:, c] > cfg.score_thresh,
                           scores[:, c], NEG_INF)
            top, idx = matching.topk_maybe_approx(sc, k_cls,
                                                  cfg.approx_topk)
            cand_boxes.append(boxes[idx])
            cand_scores.append(top)
            cand_labels.append(jnp.full((k_cls,), c, jnp.int32))
        cboxes = jnp.concatenate(cand_boxes, axis=0)
        cscores = jnp.concatenate(cand_scores, axis=0)
        clabels = jnp.concatenate(cand_labels, axis=0)
        valid = cscores > NEG_INF / 2
        keep = nms.batched_nms_keep(cboxes, cscores, clabels,
                                    cfg.nms_thresh, valid=valid)
        d = cfg.detections_per_image
        oidx, out_valid = nms.topk_by_score(cscores, keep, d)
        return (jnp.where(out_valid[:, None], cboxes[oidx], 0.0),
                jnp.where(out_valid, cscores[oidx], 0.0),
                jnp.where(out_valid, clabels[oidx], 0),
                out_valid)

    det_boxes, det_scores, det_labels, det_valid = jax.vmap(per_image)(
        logits, deltas)
    return Detections(boxes=det_boxes, scores=det_scores,
                      labels=det_labels, valid=det_valid)


class SSD(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.backbone == "vgg16":
            from podtpu.models.vgg import VGG16SSD

            self.backbone = VGG16SSD(
                dtype=dtype, trainable_stages=cfg.trainable_backbone_stages,
                name="backbone")
            separable = False
        elif cfg.backbone == "mobilenet_v3":
            from podtpu.models.mobilenet_v3 import MobileNetV3SSDLite

            self.backbone = MobileNetV3SSDLite(
                dtype=dtype, trainable_stages=cfg.trainable_backbone_stages,
                bn_trainable=cfg.backbone_norm == "batch",
                name="backbone")
            separable = True
        else:
            raise ValueError(
                f"family='ssd*' does not support backbone {cfg.backbone!r}")
        num_anchors = tuple(2 + 2 * len(ars)
                            for ars in cfg.ssd_aspect_ratios)
        self.head = SSDHead(num_anchors=num_anchors,
                            num_classes=cfg.num_classes,
                            separable=separable, dtype=dtype, name="head")

    def _anchors(self):
        cfg = self.cfg
        grids = default_boxes(tuple(cfg.image_size),
                              tuple(cfg.ssd_feature_shapes),
                              tuple(cfg.ssd_scales),
                              tuple(cfg.ssd_aspect_ratios),
                              steps=tuple(cfg.ssd_steps))
        return jnp.concatenate([jnp.asarray(g) for g in grids], axis=0)

    def _features(self, images):
        cfg = self.cfg
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(cfg.pixel_std, jnp.float32)
        x = (images - mean) / std
        return self.backbone(x)

    def __call__(self, images, gt=None, train: bool = False,
                 rng: Optional[jax.Array] = None):
        feats = self._features(images)
        level_logits, level_deltas = self.head(feats)
        logits = jnp.concatenate(level_logits, axis=1)  # [B, N, C]
        deltas = jnp.concatenate(level_deltas, axis=1)  # [B, N, 4]
        anchors = self._anchors()
        if train:
            assert gt is not None
            return ssd_losses(logits, deltas, anchors, gt, self.cfg)
        return ssd_postprocess(logits, deltas, anchors, self.cfg)
