"""Typed configuration for the whole framework.

The reference scatters its de-facto config across click defaults and hardcoded
constants (SURVEY.md §5 "Config / flag system": lr 0.005/momentum 0.9/wd 5e-4
at `miso/object_detection/training.py:98-101`, ALRS factor 0.5/4 drops at
:109-113, box_detections_per_img=300 at `models.py:9`, CVAT url/creds at
`cli.py:101` / `cvat_web_api.py:317`, split fraction+seed at
`training.py:53-55`).  Here every knob is an explicit dataclass field.

TPU-specific additions: a *static* padded canvas (XLA needs static shapes —
replaces torchvision's dynamic min/max resize), fixed proposal/detection/GT
capacities with validity masks, and bf16 compute policy.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Faster/Mask R-CNN ResNet-50-FPN architecture + postprocess knobs.

    Defaults mirror torchvision's ``fasterrcnn_resnet50_fpn`` as configured by
    the reference (`miso/object_detection/models.py:8-12`), with static-shape
    capacities in place of dynamic sizes.
    """

    num_classes: int = 2  # including background class 0
    # Static input canvas (H, W).  Replaces torchvision min=800/max=1333
    # dynamic resize; images are fit-resized (aspect preserved) and padded.
    image_size: Tuple[int, int] = (1024, 1024)
    # ImageNet normalization (applied on device in fp32).
    pixel_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    pixel_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)

    # Detector family: 'faster_rcnn' (two-stage, the reference's model;
    # with_mask=True adds the Mask R-CNN head) or 'retinanet' (one-stage,
    # focal loss — the torchvision-zoo family the reference's vendored
    # trainer exposes via `torchvision.models.detection.__dict__`,
    # `engine/train.py:219-221`).  Use ``retinanet_config()`` for matched
    # anchor/stride/threshold defaults.
    family: str = "faster_rcnn"
    # Backbone family: 'resnet50_fpn' (the reference's main model,
    # `miso/object_detection/models.py:8`) or 'mobilenet_v2' (its second
    # family — single 1280-channel stride-32 feature map, 5x3 anchors per
    # location, single-level RoIAlign;
    # `miso/instance_segmentation/training.py:7-36`).  Use
    # ``mobilenet_config()`` for matched anchor/stride defaults.
    backbone: str = "resnet50_fpn"
    backbone_depth: int = 50
    trainable_backbone_stages: int = 3  # of 5 (stem + 4 stages), from the top
    # Backbone normalisation: "frozen" (torchvision FrozenBatchNorm2d —
    # the PRETRAINED-start norm) or "batch" (torch BatchNorm2d — the norm
    # torchvision's detection constructors select for from-scratch
    # training: ``norm_layer = FrozenBatchNorm2d if is_trained else
    # nn.BatchNorm2d``).  train() auto-selects "batch" for from-scratch
    # runs on the mobile trunks, where identity-init frozen BN measurably
    # prevents learning (the round-5 mobilenet_v3 diagnosis); ResNet
    # trains well frozen-from-scratch and keeps "frozen" unless forced.
    # Stored in the model config, so saved models rebuild with the norm
    # they were trained with.
    backbone_norm: str = "frozen"
    fpn_channels: int = 256
    # Evaluate the stem 7x7/s2 conv via 2x2 space-to-depth (exact same
    # math; see models/resnet.py StemConv).  Raises stem MXU occupancy 4x
    # but costs an input-layout transform; measured NET NEGATIVE at the
    # 1024x1024/b4 operating point on v5e (+5 ms: the bf16 lane-3 transpose
    # copies outweigh the conv saving), so off by default.
    stem_space_to_depth: bool = False

    # Anchors: one entry per level.  An entry may itself be a tuple of
    # sizes (single-feature-map backbones put all 5 sizes on one grid).
    anchor_sizes: Tuple = (32, 64, 128, 256, 512)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)

    # v2 recipe knobs (torchvision ``fasterrcnn_resnet50_fpn_v2`` /
    # ``maskrcnn_resnet50_fpn_v2`` — the "Benchmarking Detection Transfer
    # Learning" heads; use ``fasterrcnn_v2_config()`` for the preset):
    # 2-deep RPN conv tower, conv+fc box head with normalisation, and
    # normed FPN blocks.  Norm layers import the checkpoint's BatchNorm
    # statistics and run frozen (the framework's fine-tuning stance; the
    # reference never trains BN statistics either).
    rpn_conv_depth: int = 1
    # Run the RPN head's convs over the coarse FPN levels as ONE packed
    # canvas (1-row zero gaps make the math exact — models/rpn.py
    # _packed_apply) instead of 4 separate small convs that tile the MXU
    # poorly.  Weights/checkpoints are identical either way.
    rpn_pack_levels: bool = False
    box_head_type: str = "mlp"  # 'mlp' (TwoMLPHead) | 'convfc' (v2)
    fpn_norm: bool = False
    mask_head_norm: bool = False

    # RPN
    rpn_pre_nms_topk_train: int = 2000  # per level
    rpn_pre_nms_topk_test: int = 1000
    rpn_post_nms_topk_train: int = 2000  # total
    rpn_post_nms_topk_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_min_size: float = 1e-3
    # Proposal objectness-score floor (sigmoid space) applied before the
    # RPN NMS.  torchvision default 0.0 (off); the low-compute
    # ``fasterrcnn_mobilenet_v3_large_320_fpn`` recipe uses 0.05.
    rpn_score_thresh: float = 0.0

    # RoI box head
    roi_pool_size: int = 7
    roi_sampling_ratio: int = 2
    roi_canonical_scale: float = 224.0
    roi_canonical_level: int = 4
    box_fg_iou: float = 0.5
    box_bg_iou: float = 0.5
    box_batch_per_image: int = 512
    box_positive_fraction: float = 0.25
    box_reg_weights: Tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)

    # Detection postprocess (box_detections_per_img=300 per the reference).
    score_thresh: float = 0.05
    nms_thresh: float = 0.5
    detections_per_image: int = 300

    # RetinaNet (family='retinanet'): anchor-matching bands, focal loss,
    # and the static candidate pool fed to the final NMS.  Torchvision
    # keeps up to 1000 candidates per level; the merged pool (<= 5000 for
    # the 5-level pyramid) is re-topped to `retinanet_nms_candidates` —
    # the default covers the full torchvision pool and stays inside the
    # Pallas NMS kernel's 8192-box cap, so the single class-offset NMS
    # pass rides the kernel with no truncation.
    retinanet_fg_iou: float = 0.5
    retinanet_bg_iou: float = 0.4
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    # Candidate-pool knobs shared by BOTH one-stage pyramid families
    # (retinanet and fcos — same per-level top-k + merged-pool postprocess).
    retinanet_topk_per_level: int = 1000
    retinanet_nms_candidates: int = 5000
    # v2 recipe (torchvision ``retinanet_resnet50_fpn_v2``; use
    # ``retinanet_v2_config()``): GroupNorm(32) in both subnets, GIoU
    # box regression instead of L1, and P6 built from C5 (2048ch,
    # ``LastLevelP6P7(2048, 256)``) instead of from P5.
    retinanet_head_norm: bool = False
    retinanet_box_loss: str = "l1"  # 'l1' | 'giou'
    retinanet_p6_on_c5: bool = False

    # FCOS (family='fcos'): anchor-free one-stage detector (torchvision's
    # ``fcos_resnet50_fpn``, another `engine/train.py:219-221` zoo model).
    # Each feature-grid point regresses (l, t, r, b) side distances; gt
    # assignment is centre sampling within `fcos_center_radius * stride`
    # plus per-level scale ranges (no IoU matching).
    fcos_center_radius: float = 1.5

    # SSD (family='ssd' -> VGG16 @300, family='ssdlite' -> MobileNetV3-Large
    # @320; the remaining two torchvision-zoo detector families,
    # `engine/train.py:219-221`).  Default boxes follow torchvision's
    # ``DefaultBoxGenerator``: per-level scales s_k (len = levels + 1, the
    # extra entry feeds the last geometric-mean box), per-level aspect-ratio
    # lists, optional explicit grid steps (ssd300 recipe).  Use
    # ``ssd_config()`` / ``ssdlite_config()`` for the matched presets.
    ssd_scales: Tuple[float, ...] = ()
    ssd_aspect_ratios: Tuple = ()
    ssd_steps: Tuple[int, ...] = ()
    # Static (H, W) of each head feature map at `image_size` (computed by
    # the config helpers; VGG's ceil-mode pooling makes these non-trivial).
    ssd_feature_shapes: Tuple = ()
    ssd_iou_thresh: float = 0.5       # SSDMatcher threshold (fg==bg band)
    ssd_neg_pos_ratio: float = 3.0    # hard-negative mining ratio
    ssd_topk_per_class: int = 400     # candidates per class before NMS

    # Mask head (Mask R-CNN variant; reference `models.py:15-25`)
    with_mask: bool = False
    mask_pool_size: int = 14
    mask_resolution: int = 28
    mask_head_channels: int = 256
    # Ground-truth mask bitmaps are rasterized at canvas/mask_gt_stride.
    mask_gt_stride: int = 8

    # Keypoint head (Keypoint R-CNN — torchvision
    # ``keypointrcnn_resnet50_fpn``, the remaining `engine/train.py:219-221`
    # zoo family with a distinct head; also closes the reference engine's
    # third iou_type, `engine/engine.py:65-74` "keypoints").
    with_keypoints: bool = False
    num_keypoints: int = 17            # COCO person convention
    keypoint_pool_size: int = 14
    keypoint_resolution: int = 56      # pool 14 -> deconv 28 -> bilinear 56
    keypoint_head_channels: int = 512
    # Pool/decode the keypoint heatmap over a centre-preserving EXPANSION of
    # the RoI.  1.0 = torchvision parity (heatmap domain == box; imported
    # COCO checkpoints must keep this).  >1.0 keeps keypoints at or near the
    # box border INSIDE the heatmap domain even when the predicted box is a
    # few px tight — box-regression noise otherwise clamps their argmax to
    # the border cell and floors strict OKS regardless of heatmap quality
    # (oracle: at 2 px box noise, OKS-mAP ceiling 0.48 at 1.0 vs 0.99 at
    # 1.3).  Applied identically to train-target discretisation and decode,
    # so the learned representation is consistent.  COCO joints are
    # interior, which is why torchvision never needed this; tasks with
    # extremal keypoints do.
    keypoint_roi_expand: float = 1.0
    # Horizontal-flip index permutation (left/right joint swap for the COCO
    # skeleton).  Empty = identity (no swap) — correct for symmetric or
    # unordered keypoint sets.  ``train()``/``build_model`` default it to
    # ``COCO_17_HFLIP_INDS`` when num_keypoints == 17.  A NON-identity
    # permutation marks the skeleton as chiral: vertical flips (which have
    # no valid remap) are then disabled in the 'miso' policy.
    keypoint_hflip_inds: Tuple[int, ...] = ()

    # Static capacities
    max_gt_boxes: int = 100

    # Compute policy
    compute_dtype: str = "bfloat16"  # backbone/FPN/head matmul dtype
    # Use TPU-native approx_max_k for large top-k selections (pre-NMS anchor
    # selection, pos/neg subsampling).  Exact top-k on TPU is a full sort;
    # the approximate PartialReduce is ~10x cheaper and these call sites are
    # order-insensitive (random subsampling) or recall-tolerant (pre-NMS
    # candidate pools).
    approx_topk: bool = True
    # Use the Pallas RoIAlign kernels (one strided window DMA per RoI +
    # separable MXU interpolation) instead of XLA point gathers.  Only takes
    # effect on the TPU backend; CPU always uses the XLA reference path.
    use_pallas_roi_align: bool = True

    @property
    def num_levels(self) -> int:
        return len(self.strides)

    @property
    def anchors_per_location(self) -> int:
        """Anchors per grid cell: ratios x (sizes at that level).  Every
        level must carry the same count (the RPN head convs are shared)."""
        first = self.anchor_sizes[0]
        per_level = len(first) if isinstance(first, (tuple, list)) else 1
        return len(self.anchor_ratios) * per_level

    @property
    def roi_strides(self) -> Tuple[int, ...]:
        """Strides of the levels feeding the RoI heads: P2..P5 for the FPN
        model (P6 is RPN-only, torchvision semantics); every level
        otherwise (single-map backbones).

        ``mobilenet_v3_fpn``: torchvision's extractor taps two STRIDE-32
        maps, so its ``MultiScaleRoIAlign`` scale setup collapses to a
        single level (k_min == k_max == 5) and every RoI pools from map 0
        — replicated here by exposing only the first level."""
        if self.backbone == "resnet50_fpn":
            return tuple(self.strides[:4])
        if self.backbone == "mobilenet_v3_fpn":
            return (self.strides[0],)
        return tuple(self.strides)


# Left/right joint swap of the COCO person-17 skeleton under horizontal
# flip (nose, then eye/ear/shoulder/elbow/wrist/hip/knee/ankle L-R pairs).
COCO_17_HFLIP_INDS = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13,
                      16, 15)


def mobilenet_config(cfg: "ModelConfig" = None, **kw) -> "ModelConfig":
    """A ModelConfig matching the reference's MobileNetV2 detector snippet
    (`miso/instance_segmentation/training.py:7-36`): single stride-32
    feature map, 5 sizes x 3 ratios per location, single-level RoIAlign
    (pool 7, sampling 2).  Capacities are scaled to the single level's
    anchor count (a 1024 canvas has 32x32x15 = 15360 anchors, vs 262k for
    the FPN model)."""
    base = cfg or ModelConfig()
    return dataclasses.replace(
        base,
        backbone="mobilenet_v2",
        strides=(32,),
        anchor_sizes=((32.0, 64.0, 128.0, 256.0, 512.0),),
        # One level: the level-assignment heuristic is moot; the XLA
        # RoIAlign path is the validated one at C=1280 (the Pallas kernel's
        # VMEM windows are sized for 256-channel FPN maps).
        use_pallas_roi_align=False,
        **kw)


def fasterrcnn_v2_config(cfg: "ModelConfig" = None, **kw) -> "ModelConfig":
    """A ModelConfig matching torchvision's ``fasterrcnn_resnet50_fpn_v2``
    (and, with ``with_mask=True``, ``maskrcnn_resnet50_fpn_v2``): the same
    detection pipeline with the improved-recipe heads — RPNHead with
    conv_depth=2, ``FastRCNNConvFCHead`` (4x conv256+norm, fc1024), normed
    FPN blocks, and a normed mask tower.  Anchors/thresholds are unchanged
    from v1."""
    base = cfg or ModelConfig()
    fields = dict(
        rpn_conv_depth=2,
        box_head_type="convfc",
        fpn_norm=True,
        mask_head_norm=True,
    )
    fields.update(kw)
    return dataclasses.replace(base, **fields)


def mobilenet_v3_fpn_config(cfg: "ModelConfig" = None, low_res: bool = False,
                            **kw) -> "ModelConfig":
    """A ModelConfig matching torchvision's
    ``fasterrcnn_mobilenet_v3_large_fpn`` (and, with ``low_res=True``, the
    ``..._320_fpn`` variant): MobileNetV3-Large trunk tapped at the C4
    block output (160ch) and the final conv (960ch) — BOTH stride 32 —
    plus a stride-2 max-pool third level; 5 sizes x 3 ratios = 15 anchors
    per location on every level; RoIs all pool from map 0 (see
    ``ModelConfig.roi_strides``).  The 320 recipe additionally shrinks the
    canvas and the test-time proposal budget (pre/post NMS top-150) and
    sets ``rpn_score_thresh=0.05``."""
    base = cfg or ModelConfig()
    fields = dict(
        backbone="mobilenet_v3_fpn",
        strides=(32, 32, 64),
        anchor_sizes=((32.0, 64.0, 128.0, 256.0, 512.0),) * 3,
        anchor_ratios=(0.5, 1.0, 2.0),
        # The Pallas RoIAlign kernel windows are tuned for the 4-level
        # 256-channel ResNet FPN; the single-level XLA path is the
        # validated one here (same policy as mobilenet_config).
        use_pallas_roi_align=False,
    )
    if low_res:
        fields.update(
            image_size=(320, 320),
            rpn_pre_nms_topk_test=150,
            rpn_post_nms_topk_test=150,
            rpn_score_thresh=0.05,
        )
    fields.update(kw)
    return dataclasses.replace(base, **fields)


def retinanet_config(cfg: "ModelConfig" = None, **kw) -> "ModelConfig":
    """A ModelConfig matching torchvision's ``retinanet_resnet50_fpn``:
    P3..P7 pyramid (strides 8..128), 3 octave scales x 3 ratios = 9
    anchors per location, IoU bands 0.5/0.4, score threshold 0.05."""
    base = cfg or ModelConfig()
    octave = (1.0, 2.0 ** (1.0 / 3.0), 2.0 ** (2.0 / 3.0))
    return dataclasses.replace(
        base,
        family="retinanet",
        strides=(8, 16, 32, 64, 128),
        anchor_sizes=tuple(
            tuple(s * o for o in octave) for s in (32, 64, 128, 256, 512)),
        **kw)


def retinanet_v2_config(cfg: "ModelConfig" = None, **kw) -> "ModelConfig":
    """A ModelConfig matching torchvision's ``retinanet_resnet50_fpn_v2``:
    the v1 pyramid/anchors/thresholds with GroupNorm(32) subnets, GIoU
    box regression (``head.regression_head._loss_type = 'giou'``), and
    P6 built from C5 (``LastLevelP6P7(2048, 256)`` — v1 builds it from
    P5).  A cfg already carrying the retinanet preset keeps its (possibly
    user-tuned) anchors/strides, mirroring the v1 path's guard."""
    base = cfg if (cfg is not None and cfg.family == "retinanet") \
        else retinanet_config(cfg)
    fields = dict(retinanet_head_norm=True, retinanet_box_loss="giou",
                  retinanet_p6_on_c5=True)
    fields.update(kw)
    return dataclasses.replace(base, **fields)


def fcos_config(cfg: "ModelConfig" = None, **kw) -> "ModelConfig":
    """A ModelConfig matching torchvision's ``fcos_resnet50_fpn``: P3..P7
    pyramid (strides 8..128), ONE stride-sized cell box per location (the
    anchor-free convention — the "anchor" only carries the grid point and
    the per-level scale), score threshold 0.2, NMS 0.6, 100 detections,
    1000 candidates per level, centre-sampling radius 1.5."""
    base = cfg or ModelConfig()
    return dataclasses.replace(
        base,
        family="fcos",
        strides=(8, 16, 32, 64, 128),
        anchor_sizes=(8.0, 16.0, 32.0, 64.0, 128.0),
        anchor_ratios=(1.0,),
        score_thresh=0.2,
        nms_thresh=0.6,
        detections_per_image=100,
        **kw)


def vgg_ssd_feature_shapes(image_size) -> Tuple[Tuple[int, int], ...]:
    """Head feature-map shapes of the SSD-VGG16 extractor at a given canvas.

    Mirrors the layer arithmetic of ``podtpu/models/vgg.py``: pool1/2 floor,
    pool3 CEIL (the torchvision ssd300 tweak), pool4 floor, then the extra
    blocks (two stride-2 3x3 pad-1 convs, two unpadded 3x3 convs)."""
    def per_axis(s: int):
        s1 = s // 2           # pool1
        s2 = s1 // 2          # pool2
        s3 = -(-s2 // 2)      # pool3, ceil_mode
        f0 = s3               # conv4_3 (pool5/fc6/fc7 keep 19x19)
        f1 = s3 // 2          # pool4
        f2 = (f1 + 2 - 3) // 2 + 1   # extra1: 3x3 s2 p1
        f3 = (f2 + 2 - 3) // 2 + 1   # extra2: 3x3 s2 p1
        f4 = f3 - 2           # extra3: 3x3 s1 p0
        f5 = f4 - 2           # extra4: 3x3 s1 p0
        return (f0, f1, f2, f3, f4, f5)
    hs = per_axis(image_size[0])
    ws = per_axis(image_size[1])
    return tuple(zip(hs, ws))


def ssd_config(cfg: "ModelConfig" = None, **kw) -> "ModelConfig":
    """A ModelConfig matching torchvision's ``ssd300_vgg16``: VGG16 + extra
    blocks, 6 feature maps, the original SSD paper's scales/steps, Caffe-era
    normalisation (mean-subtract, x255 scale), score 0.01 / NMS 0.45 /
    top-200 detections."""
    base = cfg or ModelConfig()
    image_size = kw.pop("image_size", (300, 300))
    steps = (8, 16, 32, 64, 100, 300) if image_size == (300, 300) else ()
    fields = dict(
        family="ssd",
        backbone="vgg16",
        image_size=image_size,
        # torchvision ssd300_vgg16 transform: mean [0.48235, 0.45882,
        # 0.40784], std 1/255 (the Caffe SSD recipe's 0-255 input range).
        pixel_mean=(0.48235, 0.45882, 0.40784),
        pixel_std=(1.0 / 255.0,) * 3,
        ssd_scales=(0.07, 0.15, 0.33, 0.51, 0.69, 0.87, 1.05),
        ssd_aspect_ratios=((2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0),
                           (2.0,), (2.0,)),
        ssd_steps=steps,
        ssd_feature_shapes=vgg_ssd_feature_shapes(image_size),
        score_thresh=0.01,
        nms_thresh=0.45,
        detections_per_image=200,
    )
    fields.update(kw)  # explicit caller overrides win
    return dataclasses.replace(base, **fields)


def mobilenet_v3_feature_shapes(image_size) -> Tuple[Tuple[int, int], ...]:
    """Head feature-map shapes of the SSDLite MobileNetV3 extractor: the
    C4 expansion tap (stride 16), the stride-32 head, then four stride-2
    3x3/pad-1 reductions (each ``floor((n - 1) / 2) + 1``)."""
    def per_axis(s: int):
        for _ in range(4):  # stem + C1 + C2 + C3
            s = (s - 1) // 2 + 1
        shapes = [s]        # C4 expansion tap (stride 16)
        for _ in range(5):  # C4 dw + 4 extras
            s = (s - 1) // 2 + 1
            shapes.append(s)
        return shapes
    hs = per_axis(image_size[0])
    ws = per_axis(image_size[1])
    return tuple(zip(hs, ws))


def ssdlite_config(cfg: "ModelConfig" = None, **kw) -> "ModelConfig":
    """A ModelConfig matching torchvision's
    ``ssdlite320_mobilenet_v3_large``: MobileNetV3-Large split at the C4
    expansion + depthwise extras, 6-anchor default boxes (scales 0.2-0.95
    + 1.0, ratios 2 & 3 everywhere), [-1, 1] input normalisation, score
    0.001 / NMS 0.55 / top-300 detections."""
    base = cfg or ModelConfig()
    image_size = kw.pop("image_size", (320, 320))
    # DefaultBoxGenerator(min_ratio=0.2, max_ratio=0.95): 6 evenly spaced
    # scales plus the trailing 1.0 for the last geometric-mean box.
    scales = tuple(0.2 + (0.95 - 0.2) * k / 5.0 for k in range(6)) + (1.0,)
    fields = dict(
        family="ssdlite",
        backbone="mobilenet_v3",
        image_size=image_size,
        pixel_mean=(0.5, 0.5, 0.5),
        pixel_std=(0.5, 0.5, 0.5),
        ssd_scales=scales,
        ssd_aspect_ratios=((2.0, 3.0),) * 6,
        ssd_steps=(),
        ssd_feature_shapes=mobilenet_v3_feature_shapes(image_size),
        ssd_topk_per_class=300,
        score_thresh=0.001,
        nms_thresh=0.55,
        detections_per_image=300,
    )
    fields.update(kw)  # explicit caller overrides win
    return dataclasses.replace(base, **fields)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimisation + schedule.  Defaults mirror the reference
    (`miso/object_detection/training.py:96-113`, `cli.py:35-80`)."""

    batch_size: int = 2
    optimiser: str = "sgd"  # 'sgd' | 'adam' | 'adamw'
    lr: float = 0.005
    momentum: float = 0.9
    # Momentum-buffer dtype: "float32" (torch parity) or "bfloat16" —
    # halves the optimizer's HBM traffic on the 41M-param flagship; the
    # update itself still computes in f32 (optax casts per step).
    momentum_dtype: str = "float32"
    # Flat-buffer SGD (podtpu/train/optim.py::FusedSGD): the whole
    # clip/wd/momentum/lr update over ONE ravelled vector instead of 86
    # per-parameter fusions (~0.12 ms fixed overhead each in the round-4
    # trace).  Same math, same order, f32; differs only in reduction
    # order inside the grad-norm and in memory layout.  Off by default
    # (opt_state layout differs, so resumes of old checkpoints need the
    # unfused chain); parity-tested in tests/test_optim.py.
    fused_sgd: bool = False
    # K train steps per dispatch on the single-device device-cache path
    # (lax.scan inside one program — device_cache.make_cached_multi_step).
    # Per-dispatch latency is the measured residue between synthetic and
    # loader-included throughput (round 5: 40.7 vs 39.3 img/s at 0.1%
    # loader wait on the tunneled chip); K amortises it.  Exactly K
    # consecutive single steps mathematically (per-step lr/rng vectors).
    # Log lines then appear once per dispatch.  1 disables.
    steps_per_dispatch: int = 8
    # How the device-cache step assembles the batch from the HBM-resident
    # dataset: "take" = one gather HLO per field (v[idx]); "slice" =
    # unroll the batch into B dynamic slices per field (contiguous row
    # copies).  Exact same math either way (parity-tested in
    # tests/test_device_cache.py).  Default "slice": the round-5 A/B on
    # the real chip measured the gather HLO of 4x3.15 MB uint8 rows at
    # +2.6 ms/step vs the unrolled slices (docs/runs/r05/
    # j70_gather_mode.log — 99.53 vs 96.90 ms).  The DP cached step
    # keeps the gather HLO (its index vector is sharded; unrolling over
    # the global batch would break the GSPMD partition).
    cache_gather: str = "slice"
    weight_decay: float = 0.0005
    adam_lr: float = 0.001
    # Separate weight decay for normalisation parameters (GroupNorm
    # scale/bias, SSD's L2Norm scale) — the vendored trainer's
    # ``--norm-weight-decay`` split (`engine/train.py:231-236`).  None =
    # norms decay with everything else (torch default).
    norm_weight_decay: object = None
    # Epoch-0 linear warmup (reference engine/engine.py:18-25).
    warmup_iters: int = 1000
    warmup_start_factor: float = 1.0 / 1000.0
    # ALRS early stopping (`shared/learning_rate_scheduler.py:51-112`).
    alrs_factor: float = 0.5
    alrs_drops: int = 4
    alrs_epochs: int = 10
    alrs_startup_factor: int = 2
    max_epochs: int = 500
    # LR schedule: 'alrs' (the miso path's adaptive early stopping, above)
    # or the vendored trainer's fixed-budget schedules
    # (`engine/train.py:254-262`): 'multistep' (MultiStepLR over lr_steps/
    # lr_gamma) and 'cosine' (CosineAnnealingLR).  The fixed schedules run
    # exactly `epochs` epochs (vendored defaults: 26, steps 16/22, gamma .1).
    lr_schedule: str = "alrs"
    epochs: int = 26
    lr_steps: Tuple[int, ...] = (16, 22)
    lr_gamma: float = 0.1
    # Held-out split (`training.py:53-57`: seed 1, 20% test).
    split_fraction: float = 0.2
    split_seed: int = 1
    # NaN handling: reference hard-exits (engine.py:42-45); we do too.
    nan_is_fatal: bool = True
    log_every: int = 10
    # Optional global-norm gradient clipping (None = off).  One-stage
    # recipes trained from scratch at the reference's SGD lr (notably
    # FCOS's focal+GIoU losses) can spike and NaN without it.
    clip_grad_norm: object = None
    # From-scratch runs (no pretrained checkpoint): initialise FrozenBN
    # statistics from one real batch (LSUV-style; podtpu/train/calibrate
    # .py).  Identity-init frozen BN leaves deep mobile trunks
    # normalisation-free and the signal VANISHES (measured 2e-4 mean
    # activation at the MobileNetV3 taps — the RPN never learns).
    # "auto" (default) measures the feature taps on a sample batch and
    # calibrates only when they are pathologically small (< 1e-3):
    # backbones that still carry signal (ResNet, MobileNetV2) train
    # better from their plain init.  True/False force.
    calibrate_bn: object = "auto"
    # Total-failure detection (round-5; deliberately beyond the
    # reference): the per-epoch COCO eval can NOTICE a run that is
    # learning nothing — mAP 0.000 epoch after epoch while the loss
    # plateaus and ALRS walks through its drops "as if converged" (the
    # round-4 mobilenet_v3 hard run burned 24 epochs that way).  After
    # `zero_map_warn_epochs` consecutive zero-mAP evals (past ALRS
    # startup) a loud diagnostic prints every epoch; with
    # `abort_on_zero_map=True` the run stops there instead of spending
    # the rest of its budget.
    zero_map_warn_epochs: int = 5
    abort_on_zero_map: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Input pipeline knobs."""

    num_workers: int = 4
    prefetch: int = 2
    # Augmentation policy (see podtpu/data/presets.py): 'miso' is the
    # reference pipeline's default (hflip+vflip+photometric distort,
    # `miso/object_detection/transforms.py:4-16`); also 'hflip', 'lsj',
    # 'multiscale', 'ssd', 'ssdlite', 'none'.
    aug_policy: str = "miso"
    hflip_prob: float = 0.5
    vflip_prob: float = 0.5
    photometric_distort: bool = True
    # device_put batches from the loader's producer thread (overlaps H2D
    # with compute on locally-attached accelerators).  OFF by default:
    # on tunneled/remote-TPU links the client serialises transfers with
    # step dispatch and throughput drops; uint8 batches keep the in-line
    # transfer small either way.
    device_prefetch: bool = False
    # Batch-level Simple Copy-Paste (reference engine/transforms.py:475-626),
    # applied before the per-image policy.
    copy_paste: bool = False
    # In-memory decoded-canvas cache: after epoch 0 the host pipeline skips
    # JPEG decode (augmentation is device-side, so raw canvases are
    # reusable).  "auto" enables it when the dataset fits the budget
    # (default 2 GiB, override with $PODTPU_CACHE_BYTES); True/False force.
    decode_cache: object = "auto"
    # Device-resident training data (podtpu/data/device_cache.py): pin all
    # canvases in HBM once and gather batches on device — the per-step
    # host->device image upload disappears (it is the whole loader gap on
    # tunneled chips).  "auto" enables it for single-device training when
    # the dataset fits $PODTPU_DEVICE_CACHE_BYTES (default 2 GiB).
    device_data_cache: object = "auto"


@dataclasses.dataclass(frozen=True)
class CvatConfig:
    """CVAT server connection (reference hardcodes url `http://cvat:8080`
    at `cli.py:101` and `admin`/`admin` at `cvat_web_api.py:317`)."""

    server: str = "http://cvat:8080"
    username: str = "admin"
    password: str = "admin"
    api: str = "v1"  # 'v1' -> api/v1 prefix, 'v2' -> api (cvat_web_api.py:188-193)
    is_wsl2: bool = False


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    cvat: CvatConfig = dataclasses.field(default_factory=CvatConfig)


def replace(cfg, **kw):
    """Convenience: dataclasses.replace that works on nested configs."""
    return dataclasses.replace(cfg, **kw)
