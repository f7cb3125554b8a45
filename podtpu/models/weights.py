"""Pretrained weight import: torchvision state_dict -> podtpu param tree.

The reference fine-tunes from torchvision's COCO-pretrained
``fasterrcnn_resnet50_fpn`` checkpoint (preloaded by its Dockerfile,
`/root/reference/Dockerfile:4-5`, used via ``weights="DEFAULT"`` at
`miso/object_detection/models.py:8-9`).  This module converts such a
checkpoint (a ``.pth`` state_dict, loadable with CPU torch) into this
framework's Flax parameter tree:

* conv weights: OIHW -> HWIO transpose;
* linear weights: [out, in] -> [in, out] transpose;
* FrozenBatchNorm weight/bias/running_mean/running_var -> the ``frozen``
  collection's weight/bias/mean/var;
* torchvision module paths -> podtpu module names (backbone.body.layerX.Y ->
  backbone/layerX_Y, backbone.fpn.inner_blocks -> fpn/lateralN, rpn.head ->
  rpn_head, roi_heads.box_head/predictor -> box_head, mask head likewise).

The class-specific heads (cls/reg, mask logits) are only copied when shapes
match (i.e. same num_classes); otherwise they keep their fresh init — the
same behavior as the reference's head replacement (`models.py:10-12`).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dense(w) -> np.ndarray:
    """[out, in] -> [in, out]."""
    return np.transpose(np.asarray(w), (1, 0))


def _deconv(w) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kH, kW] -> flax ConvTranspose HWIO
    [kH, kW, in, out] with flipped spatial taps."""
    return np.ascontiguousarray(
        np.transpose(np.asarray(w), (2, 3, 0, 1))[::-1, ::-1])


def _bottleneck_names(tv_prefix: str, ours_prefix: str, num_blocks: int):
    """Map torchvision layerX.B.{...} to our layerX_B modules."""
    out = {}
    for b in range(num_blocks):
        tp = f"{tv_prefix}.{b}"
        op = f"{ours_prefix}_{b}"
        for i in (1, 2, 3):
            out[f"{tp}.conv{i}.weight"] = ("params", f"{op}/conv{i}/kernel",
                                           _conv)
            for stat, ours in (("weight", "weight"), ("bias", "bias"),
                               ("running_mean", "mean"),
                               ("running_var", "var")):
                out[f"{tp}.bn{i}.{stat}"] = ("frozen", f"{op}/bn{i}/{ours}",
                                             np.asarray)
        out[f"{tp}.downsample.0.weight"] = ("params", f"{op}/conv_down/kernel",
                                            _conv)
        for stat, ours in (("weight", "weight"), ("bias", "bias"),
                           ("running_mean", "mean"), ("running_var", "var")):
            out[f"{tp}.downsample.1.{stat}"] = (
                "frozen", f"{op}/bn_down/{ours}", np.asarray)
    return out


def torchvision_key_map() -> Dict[str, Tuple[str, str, callable]]:
    """state_dict key -> (collection, 'a/b/c' path, transform)."""
    m: Dict[str, Tuple[str, str, callable]] = {}
    bb = "backbone.body"
    m[f"{bb}.conv1.weight"] = ("params", "backbone/conv1/kernel", _conv)
    for stat, ours in (("weight", "weight"), ("bias", "bias"),
                       ("running_mean", "mean"), ("running_var", "var")):
        m[f"{bb}.bn1.{stat}"] = ("frozen", f"backbone/bn1/{ours}", np.asarray)
    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        m.update(_bottleneck_names(f"{bb}.layer{stage}",
                                   f"backbone/layer{stage}", blocks))
    # FPN: inner_blocks = lateral 1x1, layer_blocks = 3x3 post convs.
    for i in range(4):
        for tvn, ours in ((f"backbone.fpn.inner_blocks.{i}",
                           f"fpn/lateral{i + 2}"),
                          (f"backbone.fpn.layer_blocks.{i}",
                           f"fpn/post{i + 2}")):
            # torchvision >=0.13 nests a `.0` Conv2dNormActivation member.
            for cand in (tvn, f"{tvn}.0"):
                m[f"{cand}.weight"] = ("params", f"{ours}/kernel", _conv)
                m[f"{cand}.bias"] = ("params", f"{ours}/bias", np.asarray)
    # RPN head.
    for tvn, ours in (("rpn.head.conv", "rpn_head/conv"),
                      ("rpn.head.conv.0.0", "rpn_head/conv"),
                      ("rpn.head.cls_logits", "rpn_head/objectness"),
                      ("rpn.head.bbox_pred", "rpn_head/deltas")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _conv)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    # Box head MLP + predictors.
    for tvn, ours in (("roi_heads.box_head.fc6", "box_head/fc6"),
                      ("roi_heads.box_head.fc7", "box_head/fc7"),
                      ("roi_heads.box_predictor.cls_score", "box_head/cls"),
                      ("roi_heads.box_predictor.bbox_pred", "box_head/reg")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _dense)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    # Mask head (Mask R-CNN checkpoints).
    for i in range(1, 5):
        for cand in (f"roi_heads.mask_head.mask_fcn{i}",
                     f"roi_heads.mask_head.{i - 1}.0"):
            m[f"{cand}.weight"] = ("params", f"mask_head/conv{i}/kernel",
                                   _conv)
            m[f"{cand}.bias"] = ("params", f"mask_head/conv{i}/bias",
                                 np.asarray)
    # torch ConvTranspose2d stores [in, out, kH, kW] and computes the true
    # conv gradient; flax ConvTranspose (no transpose_kernel) wants HWIO
    # [kH, kW, in, out] with the SPATIAL taps flipped (verified numerically
    # against torch in tests/test_weights.py).
    m["roi_heads.mask_predictor.conv5_mask.weight"] = (
        "params", "mask_head/deconv/kernel", _deconv)
    m["roi_heads.mask_predictor.conv5_mask.bias"] = (
        "params", "mask_head/deconv/bias", np.asarray)
    m["roi_heads.mask_predictor.mask_fcn_logits.weight"] = (
        "params", "mask_head/logits/kernel", _conv)
    m["roi_heads.mask_predictor.mask_fcn_logits.bias"] = (
        "params", "mask_head/logits/bias", np.asarray)
    # Keypoint head (keypointrcnn_resnet50_fpn): KeypointRCNNHeads is a
    # Sequential of 8 (conv, relu) pairs -> convs at even indices; the
    # predictor is one ConvTranspose2d(4x4, s2, p1).
    for i in range(8):
        m[f"roi_heads.keypoint_head.{2 * i}.weight"] = (
            "params", f"keypoint_head/conv{i + 1}/kernel", _conv)
        m[f"roi_heads.keypoint_head.{2 * i}.bias"] = (
            "params", f"keypoint_head/conv{i + 1}/bias", np.asarray)
    m["roi_heads.keypoint_predictor.kps_score_lowres.weight"] = (
        "params", "keypoint_head/deconv/kernel", _deconv)
    m["roi_heads.keypoint_predictor.kps_score_lowres.bias"] = (
        "params", "keypoint_head/deconv/bias", np.asarray)
    return m


def fasterrcnn_v2_key_map() -> Dict[str, Tuple[str, str, callable]]:
    """torchvision ``fasterrcnn_resnet50_fpn_v2`` /
    ``maskrcnn_resnet50_fpn_v2`` state_dict -> podtpu paths.

    v2 layout deltas vs v1: FPN inner/layer blocks are Conv2dNormActivation
    (conv at ``.0`` WITHOUT bias, BatchNorm at ``.1`` -> frozen
    ``*_bn``); the RPN tower is 2 deep (``rpn.head.conv.{0,1}.0``); the
    box head is ``FastRCNNConvFCHead`` (``box_head.{0..3}.{0,1}`` conv+BN,
    Flatten at 4, Linear at 5 -> ``box_head/fc`` with the NCHW->NHWC
    input permute); the mask tower convs carry BN.  The ResNet trunk and
    the predictors spell exactly like v1."""
    m: Dict[str, Tuple[str, str, callable]] = {}
    bb = "backbone.body"
    m[f"{bb}.conv1.weight"] = ("params", "backbone/conv1/kernel", _conv)
    bn_stats = (("weight", "weight"), ("bias", "bias"),
                ("running_mean", "mean"), ("running_var", "var"))
    for stat, ours in bn_stats:
        m[f"{bb}.bn1.{stat}"] = ("frozen", f"backbone/bn1/{ours}", np.asarray)
    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        m.update(_bottleneck_names(f"{bb}.layer{stage}",
                                   f"backbone/layer{stage}", blocks))
    for i in range(4):
        for tvn, ours in ((f"backbone.fpn.inner_blocks.{i}",
                           f"fpn/lateral{i + 2}"),
                          (f"backbone.fpn.layer_blocks.{i}",
                           f"fpn/post{i + 2}")):
            m[f"{tvn}.0.weight"] = ("params", f"{ours}/kernel", _conv)
            for stat, o in bn_stats:
                m[f"{tvn}.1.{stat}"] = ("frozen", f"{ours}_bn/{o}",
                                        np.asarray)
    for d, ours in ((0, "rpn_head/conv"), (1, "rpn_head/conv2")):
        m[f"rpn.head.conv.{d}.0.weight"] = ("params", f"{ours}/kernel",
                                            _conv)
        m[f"rpn.head.conv.{d}.0.bias"] = ("params", f"{ours}/bias",
                                          np.asarray)
    for tvn, ours in (("rpn.head.cls_logits", "rpn_head/objectness"),
                      ("rpn.head.bbox_pred", "rpn_head/deltas")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _conv)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    # ConvFC box head.
    for i in range(4):
        base = f"roi_heads.box_head.{i}"
        m[f"{base}.0.weight"] = ("params", f"box_head/conv{i + 1}/kernel",
                                 _conv)
        for stat, o in bn_stats:
            m[f"{base}.1.{stat}"] = ("frozen", f"box_head/bn{i + 1}/{o}",
                                     np.asarray)
    m["roi_heads.box_head.5.weight"] = (
        "params", "box_head/fc/kernel",
        lambda w: _fc6_from_torch(w, pooled_hw=7, channels=256))
    m["roi_heads.box_head.5.bias"] = ("params", "box_head/fc/bias",
                                      np.asarray)
    for tvn, ours in (("roi_heads.box_predictor.cls_score", "box_head/cls"),
                      ("roi_heads.box_predictor.bbox_pred", "box_head/reg")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _dense)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    # Mask tower (maskrcnn v2): Conv2dNormActivation blocks.
    for i in range(1, 5):
        base = f"roi_heads.mask_head.{i - 1}"
        m[f"{base}.0.weight"] = ("params", f"mask_head/conv{i}/kernel",
                                 _conv)
        for stat, o in bn_stats:
            m[f"{base}.1.{stat}"] = ("frozen", f"mask_head/bn{i}/{o}",
                                     np.asarray)
    m["roi_heads.mask_predictor.conv5_mask.weight"] = (
        "params", "mask_head/deconv/kernel", _deconv)
    m["roi_heads.mask_predictor.conv5_mask.bias"] = (
        "params", "mask_head/deconv/bias", np.asarray)
    m["roi_heads.mask_predictor.mask_fcn_logits.weight"] = (
        "params", "mask_head/logits/kernel", _conv)
    m["roi_heads.mask_predictor.mask_fcn_logits.bias"] = (
        "params", "mask_head/logits/bias", np.asarray)
    return m


def retinanet_key_map() -> Dict[str, Tuple[str, str, callable]]:
    """torchvision ``retinanet_resnet50_fpn`` state_dict -> podtpu
    RetinaNet paths: same ResNet trunk map, 3-level FPN (C3..C5 laterals)
    plus the p6/p7 extra convs, and the shared 4-conv subnets.  Both the
    pre-0.13 plain-Sequential head spelling (``conv.{2i}``) and the
    Conv2dNormActivation spelling (``conv.{i}.0``) are included — only
    one matches any given checkpoint.  The class-count-dependent
    ``cls_logits`` is copied only when shapes match (same policy as the
    Faster R-CNN predictor heads)."""
    m: Dict[str, Tuple[str, str, callable]] = {}
    bb = "backbone.body"
    m[f"{bb}.conv1.weight"] = ("params", "backbone/conv1/kernel", _conv)
    for stat, ours in (("weight", "weight"), ("bias", "bias"),
                       ("running_mean", "mean"), ("running_var", "var")):
        m[f"{bb}.bn1.{stat}"] = ("frozen", f"backbone/bn1/{ours}", np.asarray)
    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        m.update(_bottleneck_names(f"{bb}.layer{stage}",
                                   f"backbone/layer{stage}", blocks))
    # FPN over C3..C5 (returned_layers=[2,3,4] in torchvision retinanet).
    for i in range(3):
        for tvn, ours in ((f"backbone.fpn.inner_blocks.{i}",
                           f"fpn/lateral{i + 3}"),
                          (f"backbone.fpn.layer_blocks.{i}",
                           f"fpn/post{i + 3}")):
            for cand in (tvn, f"{tvn}.0"):
                m[f"{cand}.weight"] = ("params", f"{ours}/kernel", _conv)
                m[f"{cand}.bias"] = ("params", f"{ours}/bias", np.asarray)
    for tvn, ours in (("backbone.fpn.extra_blocks.p6", "fpn/p6"),
                      ("backbone.fpn.extra_blocks.p7", "fpn/p7")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _conv)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    # Shared subnets: 4 convs each + the final logits/deltas convs.
    for i in range(4):
        for tvn, ours in (
            (f"head.classification_head.conv.{2 * i}", f"head/cls_conv{i}"),
            (f"head.classification_head.conv.{i}.0", f"head/cls_conv{i}"),
            (f"head.regression_head.conv.{2 * i}", f"head/box_conv{i}"),
            (f"head.regression_head.conv.{i}.0", f"head/box_conv{i}"),
        ):
            m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _conv)
            m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    for tvn, ours in (("head.classification_head.cls_logits",
                       "head/cls_logits"),
                      ("head.regression_head.bbox_reg", "head/box_deltas")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _conv)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    return m


def retinanet_v2_key_map() -> Dict[str, Tuple[str, str, callable]]:
    """torchvision ``retinanet_resnet50_fpn_v2`` state_dict -> podtpu
    paths: the v1 trunk/FPN/p6p7/logits spellings plus GroupNorm(32) in
    the subnets (Conv2dNormActivation: conv at ``conv.{i}.0`` WITHOUT
    bias, GN at ``conv.{i}.1`` -> flax scale/bias in 'params')."""
    m = retinanet_key_map()
    # Drop the v1 plain-Sequential subnet spellings (conv.{2i}) — a v2
    # checkpoint never has them, and the conv.{i}.0 alias stays.
    for i in range(4):
        for tvh in ("classification_head", "regression_head"):
            m.pop(f"head.{tvh}.conv.{2 * i}.weight", None)
            m.pop(f"head.{tvh}.conv.{2 * i}.bias", None)
    for i in range(4):
        for tvh, ours in (("classification_head", "cls"),
                          ("regression_head", "box")):
            base = f"head.{tvh}.conv.{i}.1"
            m[f"{base}.weight"] = ("params", f"head/{ours}_gn{i}/scale",
                                   np.asarray)
            m[f"{base}.bias"] = ("params", f"head/{ours}_gn{i}/bias",
                                 np.asarray)
    return m


def fcos_key_map() -> Dict[str, Tuple[str, str, callable]]:
    """torchvision ``fcos_resnet50_fpn`` state_dict -> podtpu FCOS paths.

    Same ResNet trunk + C3..C5 FPN + p6/p7 extras as the RetinaNet map;
    the heads are plain ``nn.Sequential(conv, GroupNorm, ReLU)`` towers
    (conv at index 3i, GroupNorm at 3i+1 — torchvision
    ``FCOSClassificationHead``/``FCOSRegressionHead``), ending in
    ``cls_logits`` / ``bbox_reg`` + ``bbox_ctrness``.  GroupNorm
    weight/bias map to flax scale/bias (both live in 'params')."""
    m: Dict[str, Tuple[str, str, callable]] = {}
    bb = "backbone.body"
    m[f"{bb}.conv1.weight"] = ("params", "backbone/conv1/kernel", _conv)
    for stat, ours in (("weight", "weight"), ("bias", "bias"),
                       ("running_mean", "mean"), ("running_var", "var")):
        m[f"{bb}.bn1.{stat}"] = ("frozen", f"backbone/bn1/{ours}", np.asarray)
    for stage, blocks in enumerate((3, 4, 6, 3), start=1):
        m.update(_bottleneck_names(f"{bb}.layer{stage}",
                                   f"backbone/layer{stage}", blocks))
    for i in range(3):
        for tvn, ours in ((f"backbone.fpn.inner_blocks.{i}",
                           f"fpn/lateral{i + 3}"),
                          (f"backbone.fpn.layer_blocks.{i}",
                           f"fpn/post{i + 3}")):
            for cand in (tvn, f"{tvn}.0"):
                m[f"{cand}.weight"] = ("params", f"{ours}/kernel", _conv)
                m[f"{cand}.bias"] = ("params", f"{ours}/bias", np.asarray)
    for tvn, ours in (("backbone.fpn.extra_blocks.p6", "fpn/p6"),
                      ("backbone.fpn.extra_blocks.p7", "fpn/p7")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _conv)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    for i in range(4):
        for tvh, ours in (("classification_head", "cls"),
                          ("regression_head", "box")):
            base = f"head.{tvh}.conv"
            m[f"{base}.{3 * i}.weight"] = (
                "params", f"head/{ours}_conv{i}/kernel", _conv)
            m[f"{base}.{3 * i}.bias"] = (
                "params", f"head/{ours}_conv{i}/bias", np.asarray)
            m[f"{base}.{3 * i + 1}.weight"] = (
                "params", f"head/{ours}_gn{i}/scale", np.asarray)
            m[f"{base}.{3 * i + 1}.bias"] = (
                "params", f"head/{ours}_gn{i}/bias", np.asarray)
    for tvn, ours in (("head.classification_head.cls_logits",
                       "head/cls_logits"),
                      ("head.regression_head.bbox_reg", "head/box_deltas"),
                      ("head.regression_head.bbox_ctrness", "head/ctrness")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _conv)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    return m


def ssd_vgg16_key_map() -> Dict[str, Tuple[str, str, callable]]:
    """torchvision ``ssd300_vgg16`` state_dict -> podtpu SSD paths.

    Layout facts encoded here (``torchvision/models/detection/ssd.py``):
    the VGG trunk keeps its ``features.{i}`` conv indices through conv4_3
    (i in 0,2 / 5,7 / 10,12,14 / 17,19,21); ``scale_weight`` is the L2Norm
    rescale; ``extra.0`` is ``Sequential(maxpool4, conv5_1..3 + ReLUs,
    fc=Sequential(maxpool5, fc6, ReLU, fc7, ReLU))`` so conv5s sit at
    ``extra.0.{1,3,5}`` and fc6/fc7 at ``extra.0.7.{1,3}``; extras 1-4 are
    ``Sequential(1x1, ReLU, 3x3, ReLU)`` (``.{0,2}``); the heads are
    per-level ``module_list.{k}`` convs.  Also accepts plain ImageNet
    ``vgg16`` checkpoints (bare ``features.{i}`` keys) for
    backbone-only init."""
    m: Dict[str, Tuple[str, str, callable]] = {}
    trunk = [(0, "conv1_1"), (2, "conv1_2"), (5, "conv2_1"), (7, "conv2_2"),
             (10, "conv3_1"), (12, "conv3_2"), (14, "conv3_3"),
             (17, "conv4_1"), (19, "conv4_2"), (21, "conv4_3")]
    for i, ours in trunk:
        for tvp in (f"backbone.features.{i}", f"features.{i}"):
            m[f"{tvp}.weight"] = ("params", f"backbone/{ours}/kernel", _conv)
            m[f"{tvp}.bias"] = ("params", f"backbone/{ours}/bias", np.asarray)
    # Plain vgg16 checkpoints continue into conv5 at features.{24,26,28}.
    for i, ours in [(24, "conv5_1"), (26, "conv5_2"), (28, "conv5_3")]:
        m[f"features.{i}.weight"] = ("params", f"backbone/{ours}/kernel",
                                     _conv)
        m[f"features.{i}.bias"] = ("params", f"backbone/{ours}/bias",
                                   np.asarray)
    m["backbone.scale_weight"] = ("params", "backbone/l2norm_scale",
                                  np.asarray)
    for i, ours in [(1, "conv5_1"), (3, "conv5_2"), (5, "conv5_3")]:
        m[f"backbone.extra.0.{i}.weight"] = (
            "params", f"backbone/{ours}/kernel", _conv)
        m[f"backbone.extra.0.{i}.bias"] = (
            "params", f"backbone/{ours}/bias", np.asarray)
    for i, ours in [(1, "fc6"), (3, "fc7")]:
        m[f"backbone.extra.0.7.{i}.weight"] = (
            "params", f"backbone/{ours}/kernel", _conv)
        m[f"backbone.extra.0.7.{i}.bias"] = (
            "params", f"backbone/{ours}/bias", np.asarray)
    for k in range(1, 5):
        for i, sub in [(0, 1), (2, 2)]:
            m[f"backbone.extra.{k}.{i}.weight"] = (
                "params", f"backbone/extra{k}_{sub}/kernel", _conv)
            m[f"backbone.extra.{k}.{i}.bias"] = (
                "params", f"backbone/extra{k}_{sub}/bias", np.asarray)
    for k in range(6):
        for tvh, ours in (("classification_head", f"cls{k}"),
                          ("regression_head", f"reg{k}")):
            m[f"head.{tvh}.module_list.{k}.weight"] = (
                "params", f"head/{ours}/kernel", _conv)
            m[f"head.{tvh}.module_list.{k}.bias"] = (
                "params", f"head/{ours}/bias", np.asarray)
    return m


def ssdlite_key_map() -> Dict[str, Tuple[str, str, callable]]:
    """torchvision ``ssdlite320_mobilenet_v3_large`` state_dict -> podtpu
    SSDLite paths.

    The extractor splits MobileNetV3-Large at the C4 block
    (``_mobilenet_extractor``): ``backbone.features.0`` holds the stem
    (``.0.0``), blocks 1-12 (``.0.{j}.block...``) and block 13's expansion
    ConvBNAct (``.0.13``); ``backbone.features.1`` holds the REST of block
    13 as one spliced Sequential (``.1.0.{0,1,2}`` = dw / SE / project),
    blocks 14-15 (``.1.{1,2}.block...``) and the final 960-channel
    ConvBNAct (``.1.3``).  Extras are 3x Conv2dNormActivation each; heads
    are SSDLite separable convs (dw ConvBNAct + 1x1)."""
    from podtpu.models.mobilenet_v3 import V3_LARGE_SETTINGS

    bn_stats = (("weight", "weight"), ("bias", "bias"),
                ("running_mean", "mean"), ("running_var", "var"))
    m: Dict[str, Tuple[str, str, callable]] = {}

    def bn(tv: str, ours: str):
        for stat, name in bn_stats:
            m[f"{tv}.{stat}"] = ("frozen", f"{ours}/{name}", np.asarray)

    def cba(tv: str, conv_path: str, bn_path: str):
        """Conv2dNormActivation: .0 conv (no bias), .1 BN."""
        m[f"{tv}.0.weight"] = ("params", f"{conv_path}/kernel", _conv)
        bn(f"{tv}.1", bn_path)

    def se(tv: str, ours: str):
        for fc in ("fc1", "fc2"):
            m[f"{tv}.{fc}.weight"] = ("params", f"{ours}/se_{fc}/kernel",
                                      _conv)
            m[f"{tv}.{fc}.bias"] = ("params", f"{ours}/se_{fc}/bias",
                                    np.asarray)

    def inverted_residual(tv: str, ours: str, has_expand: bool,
                          use_se: bool):
        i = 0
        if has_expand:
            cba(f"{tv}.block.{i}", f"{ours}/expand", f"{ours}/bn_expand")
            i += 1
        cba(f"{tv}.block.{i}", f"{ours}/dw", f"{ours}/bn_dw")
        i += 1
        if use_se:
            se(f"{tv}.block.{i}", ours)
            i += 1
        cba(f"{tv}.block.{i}", f"{ours}/project", f"{ours}/bn_project")

    cba("backbone.features.0.0", "backbone/stem", "backbone/bn_stem")
    in_ch = 16
    for idx, (k, e, c, use_se, a, s) in enumerate(V3_LARGE_SETTINGS,
                                                  start=1):
        ours = f"backbone/block{idx}"
        if idx < 13:
            inverted_residual(f"backbone.features.0.{idx}", ours,
                              has_expand=(e != in_ch), use_se=use_se)
        elif idx == 13:
            # Split block: expansion in part 0, the rest spliced into
            # part 1's first Sequential.
            cba("backbone.features.0.13", f"{ours}/expand",
                f"{ours}/bn_expand")
            cba("backbone.features.1.0.0", f"{ours}/dw", f"{ours}/bn_dw")
            se("backbone.features.1.0.1", ours)
            cba("backbone.features.1.0.2", f"{ours}/project",
                f"{ours}/bn_project")
        else:
            inverted_residual(f"backbone.features.1.{idx - 13}", ours,
                              has_expand=(e != in_ch), use_se=use_se)
        in_ch = c
    cba("backbone.features.1.3", "backbone/head", "backbone/bn_head")
    for k in range(1, 5):
        tv = f"backbone.extra.{k - 1}"
        ours = f"backbone/extra{k}"
        cba(f"{tv}.0", f"{ours}_1", f"{ours}_bn1")
        cba(f"{tv}.1", f"{ours}_dw", f"{ours}_bn2")
        cba(f"{tv}.2", f"{ours}_2", f"{ours}_bn3")
    # Heads: module_list.{k} = Sequential(Conv2dNormActivation dw, Conv 1x1).
    for k in range(6):
        for tvh, ours in (("classification_head", f"cls{k}"),
                          ("regression_head", f"reg{k}")):
            base = f"head.{tvh}.module_list.{k}"
            cba(f"{base}.0", f"head/{ours}/dw", f"head/{ours}/bn")
            m[f"{base}.1.weight"] = ("params", f"head/{ours}/pw/kernel",
                                     _conv)
            m[f"{base}.1.bias"] = ("params", f"head/{ours}/pw/bias",
                                   np.asarray)
    return m


def fasterrcnn_mobilenet_v3_key_map() -> Dict[str, Tuple[str, str, callable]]:
    """torchvision ``fasterrcnn_mobilenet_v3_large_fpn`` (and ``_320_fpn``)
    state_dict -> podtpu paths.

    Unlike the SSDLite extractor, the trunk is NOT split: the body is the
    plain ``features`` sequential (``backbone.body.0.0`` stem conv,
    ``backbone.body.{i}.block...`` inverted residuals, ``backbone.body.16``
    final ConvBNAct).  The FPN has two levels (inner/layer blocks 0-1 ->
    our lateral0/post0, lateral1/post1; the max-pool extra has no params);
    RPN and RoI heads use the standard Faster R-CNN spellings."""
    from podtpu.models.mobilenet_v3 import V3_LARGE_SETTINGS

    bn_stats = (("weight", "weight"), ("bias", "bias"),
                ("running_mean", "mean"), ("running_var", "var"))
    m: Dict[str, Tuple[str, str, callable]] = {}

    def bn(tv: str, ours: str):
        for stat, name in bn_stats:
            m[f"{tv}.{stat}"] = ("frozen", f"{ours}/{name}", np.asarray)

    def cba(tv: str, conv_path: str, bn_path: str):
        m[f"{tv}.0.weight"] = ("params", f"{conv_path}/kernel", _conv)
        bn(f"{tv}.1", bn_path)

    def se(tv: str, ours: str):
        for fc in ("fc1", "fc2"):
            m[f"{tv}.{fc}.weight"] = ("params", f"{ours}/se_{fc}/kernel",
                                      _conv)
            m[f"{tv}.{fc}.bias"] = ("params", f"{ours}/se_{fc}/bias",
                                    np.asarray)

    body = "backbone.body"
    # features[0] IS the stem Conv2dNormActivation: conv at body.0.0,
    # BN at body.0.1 (no extra nesting — unlike the ssdlite SPLIT
    # extractor whose part-0 Sequential adds one level).
    cba(f"{body}.0", "backbone/stem", "backbone/bn_stem")
    in_ch = 16
    for idx, (k, e, c, use_se, a, s) in enumerate(V3_LARGE_SETTINGS,
                                                  start=1):
        tv = f"{body}.{idx}.block"
        ours = f"backbone/block{idx}"
        i = 0
        if e != in_ch:
            cba(f"{tv}.{i}", f"{ours}/expand", f"{ours}/bn_expand")
            i += 1
        cba(f"{tv}.{i}", f"{ours}/dw", f"{ours}/bn_dw")
        i += 1
        if use_se:
            se(f"{tv}.{i}", ours)
            i += 1
        cba(f"{tv}.{i}", f"{ours}/project", f"{ours}/bn_project")
        in_ch = c
    cba(f"{body}.16", "backbone/head", "backbone/bn_head")
    for i in range(2):
        for tvn, ours in ((f"backbone.fpn.inner_blocks.{i}",
                           f"fpn/lateral{i}"),
                          (f"backbone.fpn.layer_blocks.{i}",
                           f"fpn/post{i}")):
            for cand in (tvn, f"{tvn}.0"):
                m[f"{cand}.weight"] = ("params", f"{ours}/kernel", _conv)
                m[f"{cand}.bias"] = ("params", f"{ours}/bias", np.asarray)
    for tvn, ours in (("rpn.head.conv", "rpn_head/conv"),
                      ("rpn.head.conv.0.0", "rpn_head/conv"),
                      ("rpn.head.cls_logits", "rpn_head/objectness"),
                      ("rpn.head.bbox_pred", "rpn_head/deltas")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _conv)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    for tvn, ours in (("roi_heads.box_head.fc6", "box_head/fc6"),
                      ("roi_heads.box_head.fc7", "box_head/fc7"),
                      ("roi_heads.box_predictor.cls_score", "box_head/cls"),
                      ("roi_heads.box_predictor.bbox_pred", "box_head/reg")):
        m[f"{tvn}.weight"] = ("params", f"{ours}/kernel", _dense)
        m[f"{tvn}.bias"] = ("params", f"{ours}/bias", np.asarray)
    return m


def mobilenet_v2_key_map(prefix: str = "backbone") -> Dict[str, Tuple[str, str, callable]]:
    """torchvision ``mobilenet_v2`` state_dict -> podtpu MobileNetV2 paths.

    Covers the ``features.*`` trunk the reference's snippet extracts
    (`miso/instance_segmentation/training.py:7`); ``classifier.*`` keys are
    ignored (the detector has no use for them).  Depthwise conv weights are
    torch ``[C, 1, 3, 3]`` -> flax group-conv HWIO ``[3, 3, 1, C]`` via the
    same OIHW->HWIO transpose as ordinary convs.
    """
    bn_stats = (("weight", "weight"), ("bias", "bias"),
                ("running_mean", "mean"), ("running_var", "var"))
    pre = f"{prefix}/" if prefix else ""

    def bn(tv: str, ours: str, m: dict):
        for stat, name in bn_stats:
            m[f"{tv}.{stat}"] = ("frozen", f"{ours}/{name}", np.asarray)

    from podtpu.models.mobilenet import V2_SETTINGS

    m: Dict[str, Tuple[str, str, callable]] = {}
    m["features.0.0.weight"] = ("params", f"{pre}stem/kernel", _conv)
    bn("features.0.1", f"{pre}bn_stem", m)
    idx = 0
    for t, _c, n, _s in V2_SETTINGS:
        for _ in range(n):
            idx += 1
            tv = f"features.{idx}.conv"
            op = f"{pre}block{idx}"
            if t == 1:  # no expand: conv.0=dw ConvBNReLU, conv.1/2=project
                m[f"{tv}.0.0.weight"] = ("params", f"{op}/dw/kernel", _conv)
                bn(f"{tv}.0.1", f"{op}/bn_dw", m)
                m[f"{tv}.1.weight"] = ("params", f"{op}/project/kernel", _conv)
                bn(f"{tv}.2", f"{op}/bn_project", m)
            else:
                m[f"{tv}.0.0.weight"] = ("params", f"{op}/expand/kernel",
                                         _conv)
                bn(f"{tv}.0.1", f"{op}/bn_expand", m)
                m[f"{tv}.1.0.weight"] = ("params", f"{op}/dw/kernel", _conv)
                bn(f"{tv}.1.1", f"{op}/bn_dw", m)
                m[f"{tv}.2.weight"] = ("params", f"{op}/project/kernel", _conv)
                bn(f"{tv}.3", f"{op}/bn_project", m)
    m["features.18.0.weight"] = ("params", f"{pre}head/kernel", _conv)
    bn("features.18.1", f"{pre}bn_head", m)
    return m


def _fc6_from_torch(w, pooled_hw: int = 7, channels: int = 256) -> np.ndarray:
    """torchvision fc6 consumes NCHW-flattened pooled features
    (C, H, W order); our box head flattens NHWC (H, W, C).  Permute the
    input dimension accordingly."""
    w = np.asarray(w)  # [out, C*H*W]
    out_dim = w.shape[0]
    w = w.reshape(out_dim, channels, pooled_hw, pooled_hw)
    w = np.transpose(w, (2, 3, 1, 0))  # H, W, C, out
    return w.reshape(pooled_hw * pooled_hw * channels, out_dim)


def _set_path(tree: dict, path: str, value: np.ndarray) -> bool:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        if k not in node:
            return False
        node = node[k]
    leaf = keys[-1]
    if leaf not in node:
        return False
    if tuple(node[leaf].shape) != tuple(value.shape):
        return False
    node[leaf] = value.astype(np.asarray(node[leaf]).dtype)
    return True


def convert_torchvision_state_dict(state_dict: Dict, variables: Dict,
                                   verbose: bool = False,
                                   return_stats: bool = False,
                                   key_map: Dict = None):
    """Copy matching weights from a torchvision state_dict into ``variables``
    (a dict with 'params' and 'frozen' trees).  Returns the updated copy;
    shape-mismatched heads are left at their fresh initialisation.

    ``key_map`` defaults to the detection map
    (:func:`torchvision_key_map`); a ``mobilenet_v2`` classification
    checkpoint (keys starting with ``features.``) is auto-detected and uses
    :func:`mobilenet_v2_key_map`.

    With ``return_stats`` also returns ``(loaded_count, skipped_keys)`` so
    callers can assert import completeness (a COCO
    ``fasterrcnn_resnet50_fpn`` checkpoint should load everything except the
    class-count-dependent predictor heads).
    """
    import jax

    out = jax.tree.map(np.asarray, jax.device_get(dict(variables)))
    if key_map is None:
        if "backbone.scale_weight" in state_dict:
            key_map = ssd_vgg16_key_map()      # ssd300_vgg16 (L2Norm scale)
        elif any(k.startswith("backbone.features.0.0.0") for k
                 in state_dict):
            key_map = ssdlite_key_map()        # split-MobileNetV3 extractor
        elif any(k.startswith("features.0.0") for k in state_dict):
            key_map = mobilenet_v2_key_map()
        elif any(k.startswith("features.") for k in state_dict):
            key_map = ssd_vgg16_key_map()      # plain ImageNet vgg16 trunk
        elif "head.regression_head.bbox_ctrness.weight" in state_dict:
            key_map = fcos_key_map()           # ctrness branch = FCOS
        elif "head.classification_head.conv.0.1.weight" in state_dict:
            key_map = retinanet_v2_key_map()   # GN subnets = retinanet v2
        elif any(k.startswith("backbone.body.0.0") for k in state_dict):
            # Unsplit MobileNetV3 body = fasterrcnn_mobilenet_v3_large_fpn
            # (the ResNet body spells its stem "backbone.body.conv1").
            key_map = fasterrcnn_mobilenet_v3_key_map()
        elif "rpn.head.conv.1.0.weight" in state_dict:
            key_map = fasterrcnn_v2_key_map()  # 2-deep RPN tower = v2
        elif any(k.startswith("head.classification_head") for k
                 in state_dict):
            key_map = retinanet_key_map()
        else:
            key_map = torchvision_key_map()
    loaded, skipped = 0, []
    for key, tensor in state_dict.items():
        if key not in key_map:
            skipped.append(key)
            continue
        collection, path, transform = key_map[key]
        value = transform(_to_numpy(tensor))
        if key == "roi_heads.box_head.fc6.weight":
            value = _fc6_from_torch(_to_numpy(tensor))
        if _set_path(out[collection], path, value):
            loaded += 1
        else:
            skipped.append(key)
    if verbose:
        print(f"weight import: {loaded} tensors loaded, "
              f"{len(skipped)} skipped")
        for k in skipped[:20]:
            print(f"  skipped: {k}")
    if return_stats:
        return out, (loaded, skipped)
    return out


def _to_numpy(tensor) -> np.ndarray:
    if hasattr(tensor, "detach"):
        return tensor.detach().cpu().numpy()
    return np.asarray(tensor)


def load_pretrained(variables: Dict, path: str, verbose: bool = True) -> Dict:
    """Load a pretrained checkpoint file into ``variables``.

    Accepts a torch ``.pth``/``.pt`` state_dict (requires the baked-in CPU
    torch), a flax ``.msgpack``, or a podtpu model DIRECTORY (its
    ``model.msgpack`` is used — the fine-tune-from-a-previous-run path).
    """
    import os
    if os.path.isdir(path):
        path = os.path.join(path, "model.msgpack")
    if path.endswith(".msgpack"):
        from flax import serialization, traverse_util
        with open(path, "rb") as fp:
            restored = serialization.msgpack_restore(fp.read())
        # Shape-aware merge (the reference's head-replacement semantics,
        # `models.py:10-12`): fine-tuning a saved podtpu model on a task
        # with a DIFFERENT label count keeps its backbone/FPN/RPN and
        # re-initialises the class-sized heads.
        flat_new = traverse_util.flatten_dict(restored)
        flat = traverse_util.flatten_dict(variables)
        copied = skipped = 0
        for k, v in flat_new.items():
            if k in flat and np.shape(flat[k]) == np.shape(v):
                flat[k] = v
                copied += 1
            else:
                skipped += 1
                if verbose:
                    print(f"[pretrained] skipping {'/'.join(map(str, k))} "
                          f"(shape {np.shape(v)} vs "
                          f"{np.shape(flat.get(k, None))})")
        if verbose:
            print(f"[pretrained] {copied} tensors loaded, "
                  f"{skipped} skipped from {path}")
        return traverse_util.unflatten_dict(flat)
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload) \
        if isinstance(payload, dict) else payload.state_dict()
    return convert_torchvision_state_dict(state_dict, variables,
                                          verbose=verbose)
