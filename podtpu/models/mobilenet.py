"""MobileNetV2 feature extractor (Flax linen), detection flavour.

TPU-native equivalent of the second detector family the reference builds:
``torchvision.models.mobilenet_v2(pretrained=True).features`` used as a
single-feature-map Faster R-CNN backbone
(`miso/instance_segmentation/training.py:7-36`: ``backbone.out_channels =
1280``, one anchor grid of 5 sizes x 3 ratios, single-level
``MultiScaleRoIAlign(featmap_names=[0])``).

Architecture matches torchvision's ``MobileNetV2(width_mult=1.0).features``
exactly (stem conv 3x3/s2 -> 17 inverted-residual blocks -> 1x1 conv to
1280), so ImageNet-pretrained ``.pth`` state_dicts convert 1:1
(models/weights.py::mobilenet_v2_key_map).  Output is ONE stride-32 map with
1280 channels.

TPU-first choices mirror models/resnet.py: NHWC, bf16 compute / fp32 params,
FrozenBatchNorm folded to scale+shift (detection fine-tuning semantics), and
``stop_gradient`` below the trainable tail so XLA prunes the frozen
backward graph.  Depthwise convs use ``feature_group_count`` — XLA:TPU maps
them onto the VPU/MXU without a custom kernel.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from podtpu.models.resnet import FrozenBatchNorm

Dtype = Any

# (expand_ratio t, out_channels c, repeats n, first-block stride s) —
# torchvision MobileNetV2 inverted_residual_setting.
V2_SETTINGS: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)
OUT_CHANNELS = 1280


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class InvertedResidual(nn.Module):
    """1x1 expand (t>1) -> 3x3 depthwise (stride here) -> 1x1 project.

    Residual connection when stride 1 and in==out (torchvision
    ``InvertedResidual.use_res_connect``).
    """

    out_ch: int
    stride: int
    expand: int
    dtype: Dtype = jnp.bfloat16
    bn_trainable: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        hidden = in_ch * self.expand
        kw = dict(use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)
        bn = lambda f, name: FrozenBatchNorm(f, dtype=self.dtype,
                                             trainable=self.bn_trainable,
                                             name=name)

        y = x
        if self.expand != 1:
            y = relu6(bn(hidden, "bn_expand")(
                nn.Conv(hidden, (1, 1), name="expand", **kw)(y)))
        y = relu6(bn(hidden, "bn_dw")(
            nn.Conv(hidden, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=hidden,
                    name="dw", **kw)(y)))
        y = bn(self.out_ch, "bn_project")(
            nn.Conv(self.out_ch, (1, 1), name="project", **kw)(y))
        if self.stride == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    """MobileNetV2 ``features``: returns ONE ``[B, H/32, W/32, 1280]`` map.

    ``trainable_stages`` counts trailing components of
    [stem, blocks 1-17, head conv] grouped into 5 freeze units like the
    ResNet backbone (stem+block1, blocks 2-3, 4-6, 7-13, 14-17+head); the
    default 3 trains the top three units.
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

        h = nn.Conv(32, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    name="stem", **kw)(x)
        h = relu6(FrozenBatchNorm(32, dtype=self.dtype,
                                  trainable=self.bn_trainable,
                                  name="bn_stem")(h))

        # Freeze-unit boundaries after these block indices (1-based), chosen
        # at the stride transitions: block 1 (s4 in), 3 (s4), 6 (s8), 13
        # (s16), 17 (s32).
        boundaries = {1: 0, 3: 1, 6: 2, 13: 3}
        idx = 0
        for t, c, n, s in V2_SETTINGS:
            for i in range(n):
                idx += 1
                stride = s if i == 0 else 1
                h = InvertedResidual(out_ch=c, stride=stride, expand=t,
                                     dtype=self.dtype,
                                     bn_trainable=self.bn_trainable,
                                     name=f"block{idx}")(h)
                if boundaries.get(idx, 99) < freeze_from:
                    h = jax.lax.stop_gradient(h)

        h = nn.Conv(OUT_CHANNELS, (1, 1), name="head", **kw)(h)
        h = relu6(FrozenBatchNorm(OUT_CHANNELS, dtype=self.dtype,
                                  trainable=self.bn_trainable,
                                  name="bn_head")(h))
        if 4 < freeze_from:
            h = jax.lax.stop_gradient(h)
        return (h,)
