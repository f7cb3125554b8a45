"""ResNet backbone (Flax linen), detection flavour.

TPU-native replacement for the torchvision ResNet-50 hidden inside the
reference's ``fasterrcnn_resnet50_fpn`` (`miso/object_detection/models.py:8`).
Matches the torchvision-v1 architecture exactly (bottleneck blocks, stride-2
on the 1x1... no — stride on the 3x3 per torchvision's ResNet) so pretrained
COCO/ImageNet weights can be converted 1:1 (see models/weights.py).

TPU-first choices:
  * NHWC layout (XLA:TPU native), bf16 compute / fp32 params;
  * FrozenBatchNorm: detection fine-tuning freezes all BN (as torchvision's
    detection models do) — folded to a per-channel scale+shift at apply time,
    so each BN fuses into the preceding conv's epilogue;
  * frozen stages carry ``stop_gradient`` so XLA prunes their backward graph
    entirely (torchvision's ``trainable_backbone_layers`` semantics).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine params.

    Parameters live in the ``frozen`` variable collection — they are loaded
    from pretrained checkpoints and never trained; at apply time the four
    vectors fold into one scale+shift.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        ones = lambda *_: jnp.ones((self.features,), jnp.float32)
        zeros = lambda *_: jnp.zeros((self.features,), jnp.float32)
        weight = self.variable("frozen", "weight", ones).value
        bias = self.variable("frozen", "bias", zeros).value
        mean = self.variable("frozen", "mean", zeros).value
        var = self.variable("frozen", "var", ones).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        shift = bias - mean * scale
        return x * scale.astype(self.dtype) + shift.astype(self.dtype)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 (stride here, torchvision style) -> 1x1(x4) with projection."""

    planes: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name=name)
        bn = lambda f, name: FrozenBatchNorm(f, dtype=self.dtype, name=name)

        identity = x
        y = nn.relu(bn(self.planes, "bn1")(conv(self.planes, 1, 1, "conv1")(x)))
        y = nn.relu(bn(self.planes, "bn2")(
            conv(self.planes, 3, self.stride, "conv2")(y)))
        y = bn(out_ch, "bn3")(conv(out_ch, 1, 1, "conv3")(y))
        if x.shape[-1] != out_ch or self.stride != 1:
            identity = bn(out_ch, "bn_down")(
                conv(out_ch, 1, self.stride, "conv_down")(x))
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet returning the four stage outputs C2..C5 (strides 4/8/16/32)."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)  # ResNet-50
    dtype: Dtype = jnp.bfloat16
    # Number of trailing components that receive gradient, out of
    # [stem, layer1, layer2, layer3, layer4].  3 (the torchvision
    # ``trainable_backbone_layers`` default for fine-tuning) trains
    # layer2..layer4 and freezes stem+layer1.
    trainable_stages: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        freeze_from = 5 - self.trainable_stages  # components [0, freeze_from) frozen

        def maybe_freeze(h, component_idx):
            # Stop gradients flowing below frozen components: their params get
            # zero grad and XLA drops the whole backward subgraph.
            return jax.lax.stop_gradient(h) if component_idx < freeze_from else h

        # Stem
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        h = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        h = maybe_freeze(h, 0)

        outs = []
        planes = 64
        for stage, blocks in enumerate(self.stage_sizes):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                h = Bottleneck(planes, stride=stride, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(h)
            h = maybe_freeze(h, stage + 1)
            outs.append(h)
            planes *= 2
        return tuple(outs)  # C2, C3, C4, C5


def resnet50(dtype=jnp.bfloat16, trainable_stages: int = 3) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype,
                  trainable_stages=trainable_stages)
