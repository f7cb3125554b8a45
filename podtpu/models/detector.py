"""Faster R-CNN / Mask R-CNN assembly (Flax linen).

TPU-native equivalent of torchvision's ``GeneralizedRCNN`` as used by the
reference (`miso/object_detection/models.py:7-25`): ResNet-50 backbone → FPN →
RPN → RoIAlign → box head (+ optional mask head).  The loss dictionary uses
the same keys torchvision produces (summed by the reference's epoch engine,
`miso/object_detection/engine/engine.py:33-34`).

TPU-first: one static canvas, fixed proposal/sample/detection capacities with
validity masks, bf16 backbone compute, anchors baked as compile-time
constants, batch handled by vmap — a single jit-compiled XLA program for the
whole forward (+loss) pass.

Input convention: ``images`` are ``[B, H, W, 3]`` float32 in [0, 1] (NHWC, the
TPU-native layout); normalization happens on-device here.  Ground truth is a
dict of fixed-capacity arrays: ``boxes [B, G, 4]`` (xyxy, canvas coords),
``labels [B, G]`` (int32, 1-based), ``valid [B, G]`` (bool), and optionally
``masks [B, G, Hm, Wm]`` (float bitmaps at ``mask_stride``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from podtpu.core.config import ModelConfig
from podtpu.models.fpn import FPN


# Optional proposal-sharding hook (set during tracing by
# podtpu.parallel.spatial): under spatial partitioning the RoI stage
# (RoIAlign gather + box-head matmuls) would otherwise replicate on every
# device — measured as ~ALL of the spatial path's work-division overhead
# (docs/runs/r05/spatial_decompose: RoI heads at 100.4% per-device share
# vs the conv stack's 12.7%).  The hook constrains the proposal axis so
# GSPMD partitions the RoI stage over BOXES instead.
_PROPOSAL_CONSTRAINT = None


def set_proposal_constraint(fn):
    """Install ``fn(x) -> x`` applied to each proposal tensor (axis 1 =
    boxes) during tracing; returns the previous hook."""
    global _PROPOSAL_CONSTRAINT
    prev = _PROPOSAL_CONSTRAINT
    _PROPOSAL_CONSTRAINT = fn
    return prev
from podtpu.models.resnet import ResNet
from podtpu.models import roi_heads as rh
from podtpu.models import rpn as rpn_lib
from podtpu.ops.anchors import grid_anchors


class FasterRCNN(nn.Module):
    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        if cfg.backbone == "mobilenet_v2":
            # Single-feature-map family (reference
            # `miso/instance_segmentation/training.py:7-36`): no FPN, the
            # RPN/RoI heads ride the one stride-32 1280-channel map.
            from podtpu.models.mobilenet import OUT_CHANNELS, MobileNetV2

            self.backbone = MobileNetV2(
                dtype=dtype, trainable_stages=cfg.trainable_backbone_stages,
                bn_trainable=cfg.backbone_norm == "batch",
                name="backbone")
            self.fpn = None
            rpn_channels = OUT_CHANNELS
        elif cfg.backbone == "mobilenet_v3_fpn":
            # torchvision ``fasterrcnn_mobilenet_v3_large_fpn`` extractor:
            # two stride-32 taps (C4 block 160ch + final conv 960ch) into
            # an FPN with a max-pool third level (see mobilenet_v3_fpn_config).
            from podtpu.models.mobilenet_v3 import MobileNetV3FPN

            self.backbone = MobileNetV3FPN(
                dtype=dtype, trainable_stages=cfg.trainable_backbone_stages,
                bn_trainable=cfg.backbone_norm == "batch",
                name="backbone")
            self.fpn = FPN(out_channels=cfg.fpn_channels, dtype=dtype,
                           first_level=0, name="fpn")
            rpn_channels = cfg.fpn_channels
        elif cfg.backbone == "resnet50_fpn":
            self.backbone = ResNet(
                stage_sizes=(3, 4, 6, 3), dtype=dtype,
                trainable_stages=cfg.trainable_backbone_stages,
                stem_space_to_depth=cfg.stem_space_to_depth, name="backbone")
            self.fpn = FPN(out_channels=cfg.fpn_channels, dtype=dtype,
                           norm=cfg.fpn_norm, name="fpn")
            rpn_channels = cfg.fpn_channels
        else:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")
        self.rpn_head = rpn_lib.RPNHead(
            num_anchors=cfg.anchors_per_location, channels=rpn_channels,
            conv_depth=cfg.rpn_conv_depth, dtype=dtype,
            pack_levels=cfg.rpn_pack_levels, name="rpn_head")
        if cfg.box_head_type == "convfc":
            # v2 recipe (FastRCNNConvFCHead; fasterrcnn_v2_config).
            self.box_head = rh.ConvFCBoxHead(num_classes=cfg.num_classes,
                                             dtype=dtype, name="box_head")
        else:
            self.box_head = rh.BoxHead(num_classes=cfg.num_classes,
                                       dtype=dtype, name="box_head")
        if cfg.with_mask:
            self.mask_head = rh.MaskHead(
                num_classes=cfg.num_classes, channels=cfg.mask_head_channels,
                norm=cfg.mask_head_norm, dtype=dtype, name="mask_head")
        if cfg.with_keypoints:
            self.keypoint_head = rh.KeypointHead(
                num_keypoints=cfg.num_keypoints,
                channels=cfg.keypoint_head_channels,
                dtype=dtype, name="keypoint_head")

    def _anchors(self):
        cfg = self.cfg
        grids = grid_anchors(tuple(cfg.image_size), tuple(cfg.strides),
                             tuple(cfg.anchor_sizes), tuple(cfg.anchor_ratios))
        return [jnp.asarray(g) for g in grids]

    def _features(self, images):
        cfg = self.cfg
        # uint8 canvases -> [0,1] float here, NEXT to the mean/std
        # normalisation, so no entry point can forget it (loaders ship
        # uint8 for 4x less host->device transfer; a caller feeding 0-255
        # through the mean/std below would silently produce garbage).
        if images.dtype == jnp.uint8:
            images = images.astype(jnp.float32) / 255.0
        mean = jnp.asarray(cfg.pixel_mean, jnp.float32)
        std = jnp.asarray(cfg.pixel_std, jnp.float32)
        x = (images - mean) / std
        feats = self.backbone(x)
        if self.fpn is None:
            return feats  # single-map backbone: (stride-32 map,)
        return self.fpn(feats)  # P2..P6

    def __call__(self, images, gt=None, train: bool = False,
                 rng: Optional[jax.Array] = None,
                 return_proposals: bool = False):
        """``return_proposals`` short-circuits inference after the RPN —
        a debugging/profiling surface (bisecting backbone+RPN vs RoI-head
        cost without model surgery)."""
        cfg = self.cfg
        pyramid = self._features(images)
        level_logits, level_deltas = self.rpn_head(pyramid)
        level_anchors = self._anchors()

        proposals = rpn_lib.select_proposals(
            level_logits, level_deltas, level_anchors, cfg, train=train)
        # Proposals are detached (torchvision semantics: no gradient flows
        # from the RoI heads through box coordinates into the RPN).
        proposals = rpn_lib.Proposals(
            boxes=jax.lax.stop_gradient(proposals.boxes),
            scores=jax.lax.stop_gradient(proposals.scores),
            valid=proposals.valid)
        if not train and _PROPOSAL_CONSTRAINT is not None:
            proposals = rpn_lib.Proposals(
                boxes=_PROPOSAL_CONSTRAINT(proposals.boxes),
                scores=_PROPOSAL_CONSTRAINT(proposals.scores),
                valid=_PROPOSAL_CONSTRAINT(proposals.valid))

        if return_proposals and not train:
            return proposals

        # P2..P5 feed the RoI heads on the FPN model (P6 is RPN-only);
        # single-map backbones use their one level.
        box_levels = pyramid[:len(cfg.roi_strides)]
        b = images.shape[0]

        if train:
            assert gt is not None and rng is not None
            # Per-image loss weight: zeroes the contribution of wrap-around
            # duplicate images the static-shape loader pads batches with.
            img_w = gt.get("image_weight")
            rng_rpn, rng_roi = jax.random.split(rng)
            obj_loss, rpn_box_loss = rpn_lib.rpn_losses(
                rng_rpn, level_logits, level_deltas,
                jnp.concatenate(level_anchors, axis=0),
                gt["boxes"], gt["valid"], cfg, img_weight=img_w)

            roi_rngs = jax.random.split(rng_roi, b)
            sampled = jax.vmap(
                lambda r, pb, pv, gb, gl, gv: rh.sample_rois(
                    r, pb, pv, gb, gl, gv, cfg)
            )(roi_rngs, proposals.boxes, proposals.valid,
              gt["boxes"], gt["labels"], gt["valid"])

            pooled = rh.pool_rois_batched(box_levels, sampled.boxes, cfg)
            s = pooled.shape[1]
            logits, deltas = self.box_head(
                pooled.reshape(b * s, *pooled.shape[2:]))
            flat_rois = jax.tree.map(
                lambda x: x.reshape((b * s,) + x.shape[2:]), sampled)
            sw = None if img_w is None else jnp.repeat(img_w, s)
            cls_loss, box_loss = rh.box_head_losses(logits, deltas, flat_rois,
                                                    sample_weight=sw)

            losses = {
                "loss_objectness": obj_loss,
                "loss_rpn_box_reg": rpn_box_loss,
                "loss_classifier": cls_loss,
                "loss_box_reg": box_loss,
            }
            if cfg.with_mask and "masks" in (gt or {}):
                losses["loss_mask"] = self._mask_losses(box_levels, sampled,
                                                        gt, img_w)
            if cfg.with_keypoints and "keypoints" in (gt or {}):
                losses["loss_keypoint"] = self._keypoint_losses(
                    box_levels, sampled, gt, img_w)
            return losses

        # ---- inference ----------------------------------------------------
        pooled = rh.pool_rois_batched(box_levels, proposals.boxes, cfg)
        p = pooled.shape[1]
        logits, deltas = self.box_head(pooled.reshape(b * p, *pooled.shape[2:]))
        logits = logits.reshape(b, p, -1)
        deltas = deltas.reshape(b, p, -1)
        det_boxes, det_scores, det_labels, det_valid = jax.vmap(
            lambda lg, dl, pb, pv: rh.postprocess_detections(
                lg, dl, pb, pv, cfg)
        )(logits, deltas, proposals.boxes, proposals.valid)
        out = rh.Detections(boxes=det_boxes, scores=det_scores,
                            labels=det_labels, valid=det_valid)
        if cfg.with_mask:
            masks = self._predict_masks(box_levels, out)
            return out, masks
        if cfg.with_keypoints:
            return out, rh.KeypointOutput(
                self._predict_keypoints(box_levels, out))
        return out

    def _mask_losses(self, box_levels, sampled, gt, img_w=None):
        cfg = self.cfg
        b, s = sampled.boxes.shape[:2]
        pooled = rh.pool_rois_batched(box_levels, sampled.boxes, cfg,
                                      pool_size=cfg.mask_pool_size)
        mask_logits = self.mask_head(pooled.reshape(b * s, *pooled.shape[2:]))
        mask_logits = mask_logits.reshape(b, s, *mask_logits.shape[1:])

        gm = gt["masks"]  # [B, G, Hm, Wm]
        hm, wm = gm.shape[2], gm.shape[3]
        mask_stride = cfg.image_size[0] // hm
        mask_geom = {"offset": jnp.asarray([0], jnp.int32),
                     "height": jnp.asarray([hm], jnp.int32),
                     "width": jnp.asarray([wm], jnp.int32)}

        def per_image(ml, rois, gmasks):
            gt_flat = gmasks.reshape(gmasks.shape[0], -1).T  # [HW, G]
            return rh.mask_loss(ml, rois, gt_flat, mask_geom, mask_stride, cfg)

        losses = jax.vmap(per_image)(mask_logits, sampled, gm)
        if img_w is None:
            return losses.mean()
        return (losses * img_w).sum() / jnp.maximum(img_w.sum(), 1.0)

    def _keypoint_losses(self, box_levels, sampled, gt, img_w=None):
        """CE heatmap loss on positive RoIs (torchvision
        ``keypointrcnn_loss`` — keypoint proposals are the box head's
        sampled positives)."""
        cfg = self.cfg
        b, s = sampled.boxes.shape[:2]
        kp_rois = rh.expand_rois(sampled.boxes, cfg.keypoint_roi_expand)
        pooled = rh.pool_rois_batched(box_levels, kp_rois, cfg,
                                      pool_size=cfg.keypoint_pool_size)
        kp_logits = self.keypoint_head(
            pooled.reshape(b * s, *pooled.shape[2:]))
        kp_logits = kp_logits.reshape(b, s, *kp_logits.shape[1:])

        def per_image(kl, rois, samp, gkp):
            # Targets are discretised in the SAME (expanded) frame the
            # heatmap was pooled over.
            return rh.keypoint_loss(kl, rois, samp, gkp)

        losses = jax.vmap(per_image)(kp_logits, kp_rois, sampled,
                                     gt["keypoints"])
        if img_w is None:
            return losses.mean()
        return (losses * img_w).sum() / jnp.maximum(img_w.sum(), 1.0)

    def _predict_keypoints(self, box_levels, det: rh.Detections):
        """Per-detection keypoints ``[B, D, K, 3]`` (x, y, score)."""
        cfg = self.cfg
        b = det.boxes.shape[0]
        kp_rois = rh.expand_rois(det.boxes, cfg.keypoint_roi_expand)
        pooled = rh.pool_rois_batched(box_levels, kp_rois, cfg,
                                      pool_size=cfg.keypoint_pool_size)
        d = pooled.shape[1]
        kl = self.keypoint_head(pooled.reshape(b * d, *pooled.shape[2:]))
        kl = kl.reshape(b, d, *kl.shape[1:])  # [B, D, H, H, K]
        return jax.vmap(rh.heatmaps_to_keypoints)(kl, kp_rois)

    def _predict_masks(self, box_levels, det: rh.Detections):
        cfg = self.cfg
        b = det.boxes.shape[0]
        pooled = rh.pool_rois_batched(box_levels, det.boxes, cfg,
                                      pool_size=cfg.mask_pool_size)
        d = pooled.shape[1]
        ml = self.mask_head(pooled.reshape(b * d, *pooled.shape[2:]))
        ml = ml.reshape(b, d, *ml.shape[1:])  # [B, D, M, M, C]
        picked = jnp.take_along_axis(
            ml, det.labels[:, :, None, None, None], axis=-1)[..., 0]
        return jax.nn.sigmoid(picked)  # [B, D, M, M]


def make_detector(cfg: ModelConfig):
    """Model family dispatch: the single constructor every entry point
    (train, inference load, tiled rebuild, init proxy) goes through, so a
    saved ``config.json`` reconstructs the right architecture."""
    family = getattr(cfg, "family", "faster_rcnn")
    if family == "retinanet":
        from podtpu.models.retinanet import RetinaNet

        return RetinaNet(cfg=cfg)
    if family == "fcos":
        from podtpu.models.fcos import FCOS

        return FCOS(cfg=cfg)
    if family in ("ssd", "ssdlite"):
        from podtpu.models.ssd import SSD

        return SSD(cfg=cfg)
    return FasterRCNN(cfg=cfg)


def init_variables(model: FasterRCNN, rng, init_canvas: int = 128):
    """Initialise parameters cheaply at a small canvas, on the CPU backend.

    Every parameter shape in the detector is canvas-independent (convs, the
    7x7-pooled box head, the mask head), so tracing `init` at the full
    production canvas only wastes compile time — notably minutes per run on
    remote-compile TPU setups.  Init at a 128px canvas on CPU (initializers
    don't need the accelerator; params transfer on first use) and use the
    params at any image size.
    """
    import dataclasses as _dc

    if model.cfg.family in ("ssd", "ssdlite"):
        # SSD's unpadded extra convs bottom out below ~272 px, and every
        # parameter is cheap at its native 300/320 canvas anyway — keep the
        # real canvas and only shrink the postprocess candidate pool (the
        # per-class pool must stay under the Pallas NMS dispatch window:
        # this init traces on the CPU device while the global backend may
        # be TPU, and a TPU-lowered pallas_call cannot lower for CPU).
        init_canvas = model.cfg.image_size[0]
        small = _dc.replace(
            model.cfg, detections_per_image=4, max_gt_boxes=4,
            ssd_topk_per_class=8)
    else:
        small = _dc.replace(
            model.cfg,
            image_size=(init_canvas, init_canvas),
            rpn_pre_nms_topk_train=64, rpn_pre_nms_topk_test=64,
            rpn_post_nms_topk_train=64, rpn_post_nms_topk_test=32,
            box_batch_per_image=8, detections_per_image=4, max_gt_boxes=4,
            use_pallas_roi_align=False,
            # Same Pallas-NMS dispatch-window concern for the RetinaNet
            # candidate pool.
            retinanet_topk_per_level=64, retinanet_nms_candidates=128)
    proxy = make_detector(small)

    def run_init():
        images = jnp.zeros((1, init_canvas, init_canvas, 3), jnp.float32)
        # One jitted program instead of eager op-by-op dispatch: eager init
        # compiles every op individually (~2s each on the CPU backend —
        # measured 541s for the ~200-op SSD-VGG graph vs 23s jitted).
        return jax.jit(lambda r: proxy.init(r, images, train=False))(rng)

    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return run_init()
    with jax.default_device(cpu):
        variables = run_init()
    # CRITICAL: commit the variables to the default (accelerator) device.
    # Arrays created under default_device(cpu) are committed to the CPU
    # backend, and a jit compiled for the TPU must then re-upload EVERY
    # parameter leaf on EVERY call — ~300 tunnel round-trips per step on
    # remote-TPU setups (measured: a 32 ms eval forward stretched to 2.8 s).
    return jax.device_put(variables, jax.devices()[0])


def build_model(num_classes: int, cfg: Optional[ModelConfig] = None,
                with_mask: bool = False,
                with_keypoints: bool = False,
                num_keypoints: int = 17,
                backbone: Optional[str] = None,
                family: Optional[str] = None) -> Tuple[nn.Module, ModelConfig]:
    """Model factory mirroring the reference's
    ``get_object_detection_model(num_classes)`` /
    ``get_instance_segmentation_model`` (`miso/object_detection/models.py:7-25`):
    ``num_classes`` INCLUDES background (reference passes len(labels)+1).

    ``backbone="mobilenet_v2"`` builds the reference's second family (the
    single-map MobileNetV2 Faster R-CNN of
    `miso/instance_segmentation/training.py:7-36`) with matched
    anchor/stride defaults.  ``family="retinanet"`` builds the one-stage
    focal-loss family (torchvision-zoo model the reference's vendored
    trainer exposes, `engine/train.py:219-221`).
    """
    import dataclasses

    from podtpu.core.config import (fasterrcnn_v2_config, fcos_config,
                                    mobilenet_config, retinanet_config,
                                    ssd_config, ssdlite_config)
    cfg = cfg or ModelConfig()
    if family == "faster_rcnn_v2":
        # Improved-recipe heads; the stored family stays 'faster_rcnn'
        # (the v2-ness lives in the rpn_conv_depth/box_head_type/norm
        # fields, so saved config.json rebuilds exactly).
        cfg = fasterrcnn_v2_config(cfg)
        family = "faster_rcnn"
    if family == "retinanet_v2":
        from podtpu.core.config import retinanet_v2_config
        cfg = retinanet_v2_config(cfg)
        family = "retinanet"
    elif family == "retinanet" and cfg.family != "retinanet":
        cfg = retinanet_config(cfg)
    if family == "fcos" and cfg.family != "fcos":
        cfg = fcos_config(cfg)
    if family == "ssd" and cfg.family != "ssd":
        cfg = ssd_config(cfg)
    if family == "ssdlite" and cfg.family != "ssdlite":
        cfg = ssdlite_config(cfg)
    if cfg.family in ("retinanet", "fcos") and (
            with_mask or cfg.with_mask or with_keypoints
            or cfg.with_keypoints
            or (backbone is not None and backbone != "resnet50_fpn")
            or cfg.backbone != "resnet50_fpn"):
        raise ValueError(
            f"family={cfg.family!r} supports neither with_mask/"
            "with_keypoints (no RoI stage) nor non-ResNet backbones "
            "(needs the P3-P7 FPN)")
    if cfg.family in ("ssd", "ssdlite") and (with_keypoints
                                             or cfg.with_keypoints):
        raise ValueError(
            "with_keypoints requires family='faster_rcnn' (SSD has no "
            "RoI stage)")
    if (with_mask or cfg.with_mask) and (with_keypoints
                                         or cfg.with_keypoints):
        raise ValueError(
            "with_mask and with_keypoints are mutually exclusive (the "
            "torchvision zoo has no combined model, and the inference "
            "output carries one extra head)")
    if cfg.family in ("ssd", "ssdlite"):
        if with_mask or cfg.with_mask:
            raise ValueError(
                "family='ssd'/'ssdlite' supports no mask head (SSD has no "
                "RoI stage; use family='faster_rcnn' with with_mask)")
        if backbone is not None and backbone != cfg.backbone:
            raise ValueError(
                f"family={cfg.family!r} is tied to its backbone "
                f"({cfg.backbone}); --backbone is not applicable")
    if backbone == "mobilenet_v2" and cfg.backbone != "mobilenet_v2":
        cfg = mobilenet_config(cfg)
    elif backbone in ("mobilenet_v3_fpn", "mobilenet_v3_320_fpn") \
            and cfg.backbone != "mobilenet_v3_fpn":
        # torchvision fasterrcnn_mobilenet_v3_large_fpn / ..._320_fpn
        # (the "320" spelling selects the low-res recipe preset).
        from podtpu.core.config import mobilenet_v3_fpn_config
        cfg = mobilenet_v3_fpn_config(
            cfg, low_res=(backbone == "mobilenet_v3_320_fpn"))
    elif backbone is not None and backbone != cfg.backbone:
        cfg = dataclasses.replace(cfg, backbone=backbone)
    if (cfg.rpn_conv_depth != 1 or cfg.box_head_type != "mlp"
            or cfg.fpn_norm) and cfg.backbone != "resnet50_fpn":
        raise ValueError(
            "family='faster_rcnn_v2' requires the ResNet-50-FPN backbone "
            "(torchvision has no v2 recipe for the mobilenet extractors, "
            "and their FPN/head wiring differs)")
    cfg = dataclasses.replace(
        cfg, num_classes=num_classes,
        with_mask=with_mask or cfg.with_mask,
        with_keypoints=with_keypoints or cfg.with_keypoints,
        num_keypoints=(num_keypoints if with_keypoints
                       else cfg.num_keypoints))
    if cfg.with_keypoints and cfg.num_keypoints == 17 \
            and not cfg.keypoint_hflip_inds:
        # COCO person-17 default left/right swap (see ModelConfig docs).
        from podtpu.core.config import COCO_17_HFLIP_INDS
        cfg = dataclasses.replace(cfg,
                                  keypoint_hflip_inds=COCO_17_HFLIP_INDS)
    return make_detector(cfg), cfg
