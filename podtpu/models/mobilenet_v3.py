"""MobileNetV3-Large feature extractor (Flax linen), SSDLite flavour.

TPU-native equivalent of torchvision's ``mobilenet_v3_large`` trunk as
wired by ``ssdlite320_mobilenet_v3_large`` (`_mobilenet_extractor`): the
network is split at the C4 stride-2 block — the first output is that
block's EXPANSION 1x1 conv output (672 channels, stride 16), the second is
the final 1x1 conv output (960 channels, stride 32) — followed by four
SSDLite extra blocks (1x1 reduce + 3x3/s2 depthwise + 1x1, all
BN + ReLU6) producing 512/256/256/128-channel maps.  Six maps total; at a
320 canvas: 20, 10, 5, 3, 2, 1.

Architecture matches torchvision's ``InvertedResidualConfig`` table for
width 1.0 exactly (squeeze-excitation on the expanded channels with
``_make_divisible(expanded // 4, 8)`` squeeze width, hard-swish / ReLU
per-row activations), so pretrained ``.pth`` state_dicts convert 1:1
(models/weights.py::ssdlite_key_map).

TPU-first choices mirror models/mobilenet.py: NHWC, bf16 compute / fp32
params, FrozenBatchNorm folded to scale+shift, depthwise convs via
``feature_group_count``, frozen stages under ``stop_gradient``.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from podtpu.models.resnet import FrozenBatchNorm

Dtype = Any


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


# (kernel, expanded_c, out_c, use_se, activation, stride) — torchvision
# mobilenet_v3_large inverted_residual_setting, width 1.0.  Input channels
# are the previous row's out_c (16 after the stem).
V3_LARGE_SETTINGS: Tuple[Tuple[int, int, int, bool, str, int], ...] = (
    (3, 16, 16, False, "RE", 1),
    (3, 64, 24, False, "RE", 2),    # C1
    (3, 72, 24, False, "RE", 1),
    (5, 72, 40, True, "RE", 2),     # C2
    (5, 120, 40, True, "RE", 1),
    (5, 120, 40, True, "RE", 1),
    (3, 240, 80, False, "HS", 2),   # C3
    (3, 200, 80, False, "HS", 1),
    (3, 184, 80, False, "HS", 1),
    (3, 184, 80, False, "HS", 1),
    (3, 480, 112, True, "HS", 1),
    (3, 672, 112, True, "HS", 1),
    (5, 672, 160, True, "HS", 2),   # C4 — split point: expansion out taps here
    (5, 960, 160, True, "HS", 1),
    (5, 960, 160, True, "HS", 1),
)
C4_BLOCK = 13  # 1-based index of the split block
C4_CHANNELS = 672
OUT_CHANNELS = (672, 960, 512, 256, 256, 128)


class InvertedResidualV3(nn.Module):
    """MobileNetV3 block: 1x1 expand -> kxk depthwise -> [SE] -> 1x1 project.

    ``split_expand=True`` additionally returns the expansion activation
    (the C4 feature tap of the SSDLite extractor).
    """

    kernel: int
    expanded: int
    out_ch: int
    use_se: bool
    act: str  # 'RE' | 'HS'
    stride: int
    split_expand: bool = False
    dtype: Dtype = jnp.bfloat16
    bn_trainable: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        act = hardswish if self.act == "HS" else nn.relu
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        bn = lambda f, name: FrozenBatchNorm(f, dtype=self.dtype,
                                             trainable=self.bn_trainable,
                                             name=name)

        y = x
        if self.expanded != in_ch:
            y = act(bn(self.expanded, "bn_expand")(
                nn.Conv(self.expanded, (1, 1), name="expand", **kw)(y)))
        expand_out = y
        p = (self.kernel - 1) // 2
        y = act(bn(self.expanded, "bn_dw")(
            nn.Conv(self.expanded, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)],
                    feature_group_count=self.expanded, name="dw", **kw)(y)))
        if self.use_se:
            squeeze = _make_divisible(self.expanded // 4, 8)
            s = jnp.mean(y.astype(jnp.float32), axis=(1, 2), keepdims=True)
            s = nn.relu(nn.Conv(squeeze, (1, 1), dtype=jnp.float32,
                                param_dtype=jnp.float32, name="se_fc1")(s))
            s = hardsigmoid(nn.Conv(self.expanded, (1, 1), dtype=jnp.float32,
                                    param_dtype=jnp.float32,
                                    name="se_fc2")(s))
            y = y * s.astype(y.dtype)
        y = bn(self.out_ch, "bn_project")(
            nn.Conv(self.out_ch, (1, 1), name="project", **kw)(y))
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        if self.split_expand:
            return y, expand_out
        return y


class MobileNetV3FPN(nn.Module):
    """MobileNetV3-Large trunk with the two FPN taps of torchvision's
    ``fasterrcnn_mobilenet_v3_large_fpn`` extractor (``_mobilenet_extractor``
    with fpn=True, returned_layers=[4, 5]): the C4 block's OUTPUT
    (``features[13]``, 160 channels, stride 32) and the final 1x1 conv
    output (``features[16]``, 960 channels, stride 32).  Both taps share
    stride 32 — that is torchvision's actual (degenerate) geometry; the
    FPN's top-down step between them is a same-size add and the third RPN
    level is a stride-2 max-pool.

    ``trainable_stages`` freeze units match :class:`MobileNetV3SSDLite`.
    """

    dtype: Dtype = jnp.bfloat16
    trainable_stages: int = 3
    # torchvision's from-scratch norm rule (see FrozenBatchNorm.trainable).
    bn_trainable: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        freeze_from = 5 - self.trainable_stages

        h = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    name="stem", **kw)(x)
        h = hardswish(FrozenBatchNorm(16, dtype=self.dtype,
                                      trainable=self.bn_trainable, name="bn_stem")(h))

        boundaries = {1: 0, 3: 1, 6: 2, 12: 3}
        c13 = None
        for idx, (k, e, c, se, a, s) in enumerate(V3_LARGE_SETTINGS,
                                                  start=1):
            h = InvertedResidualV3(
                kernel=k, expanded=e, out_ch=c, use_se=se, act=a, stride=s,
                dtype=self.dtype, bn_trainable=self.bn_trainable,
                name=f"block{idx}")(h)
            if idx == C4_BLOCK:
                c13 = h  # 160-channel stride-32 tap (features[13] output)
            # Freeze boundaries all sit BEFORE the C4 block (keys 1/3/6/12),
            # so the tap itself is only frozen by the final all-stages check.
            if boundaries.get(idx, 99) < freeze_from:
                h = jax.lax.stop_gradient(h)

        h = nn.Conv(960, (1, 1), name="head", **kw)(h)
        h = hardswish(FrozenBatchNorm(960, dtype=self.dtype,
                                      trainable=self.bn_trainable, name="bn_head")(h))
        if 4 < freeze_from:
            h = jax.lax.stop_gradient(h)
            c13 = jax.lax.stop_gradient(c13)
        return (c13, h)


class MobileNetV3SSDLite(nn.Module):
    """MobileNetV3-Large trunk + SSDLite extras: 6 feature maps.

    ``trainable_stages`` counts trailing freeze units of
    [stem+block1, blocks 2-3 (C1), 4-6 (C2), 7-12 (C3), 13-15+head (C4+)];
    the extras are always trainable.
    """

    dtype: Dtype = jnp.bfloat16
    trainable_stages: int = 3
    # torchvision's from-scratch norm rule (see FrozenBatchNorm.trainable).
    bn_trainable: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        freeze_from = 5 - self.trainable_stages

        h = nn.Conv(16, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    name="stem", **kw)(x)
        h = hardswish(FrozenBatchNorm(16, dtype=self.dtype,
                                      trainable=self.bn_trainable, name="bn_stem")(h))

        boundaries = {1: 0, 3: 1, 6: 2, 12: 3}  # after block idx -> unit
        c4 = None
        for idx, (k, e, c, se, a, s) in enumerate(V3_LARGE_SETTINGS,
                                                  start=1):
            block = InvertedResidualV3(
                kernel=k, expanded=e, out_ch=c, use_se=se, act=a, stride=s,
                split_expand=(idx == C4_BLOCK), dtype=self.dtype,
                bn_trainable=self.bn_trainable, name=f"block{idx}")
            if idx == C4_BLOCK:
                h, c4 = block(h)
            else:
                h = block(h)
            if boundaries.get(idx, 99) < freeze_from:
                h = jax.lax.stop_gradient(h)

        h = nn.Conv(960, (1, 1), name="head", **kw)(h)
        h = hardswish(FrozenBatchNorm(960, dtype=self.dtype,
                                      trainable=self.bn_trainable, name="bn_head")(h))
        if 4 < freeze_from:
            h = jax.lax.stop_gradient(h)
            c4 = jax.lax.stop_gradient(c4)

        # SSDLite extras: 1x1 reduce (out/2) -> 3x3/s2 depthwise -> 1x1.
        def extra(h, out_ch, name):
            mid = out_ch // 2
            h = relu6(FrozenBatchNorm(mid, dtype=self.dtype,
                                      trainable=self.bn_trainable, name=f"{name}_bn1")(
                nn.Conv(mid, (1, 1), name=f"{name}_1", **kw)(h)))
            h = relu6(FrozenBatchNorm(mid, dtype=self.dtype,
                                      trainable=self.bn_trainable, name=f"{name}_bn2")(
                nn.Conv(mid, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], feature_group_count=mid,
                        name=f"{name}_dw", **kw)(h)))
            h = relu6(FrozenBatchNorm(out_ch, dtype=self.dtype,
                                      trainable=self.bn_trainable, name=f"{name}_bn3")(
                nn.Conv(out_ch, (1, 1), name=f"{name}_2", **kw)(h)))
            return h

        out2 = extra(h, 512, "extra1")
        out3 = extra(out2, 256, "extra2")
        out4 = extra(out3, 256, "extra3")
        out5 = extra(out4, 128, "extra4")
        return (c4, h, out2, out3, out4, out5)
