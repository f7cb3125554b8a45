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
    """BatchNorm with fixed statistics and affine params — plus a
    ``trainable`` mode reproducing ``torch.nn.BatchNorm2d``.

    ``trainable=False`` (default): parameters live in the ``frozen``
    variable collection — they are loaded from pretrained checkpoints and
    never trained; at apply time the four vectors fold into one
    scale+shift.  This is torchvision's ``FrozenBatchNorm2d``, which it
    selects ONLY for pretrained starts (``norm_layer = FrozenBatchNorm2d
    if is_trained else nn.BatchNorm2d`` in every detection constructor).

    ``trainable=True`` (round 5): the from-scratch norm torchvision would
    use.  The affine weight/bias move to ``params`` (trained, weight-
    decayed like torch), the running mean/var stay in ``frozen`` (same
    names, so checkpoint paths are stable) and update with torch's 0.1
    momentum whenever the caller marks the ``frozen`` collection mutable
    — the training step's signal; evaluation applies without mutability
    and gets the running averages, exactly torch eval semantics.
    Measured necessity: identity-init frozen BN leaves the 15-block
    MobileNetV3 trunk effectively normalisation-free and its RPN never
    learns the hard task (objectness separation 0.000,
    docs/runs/r05/) — one-shot calibration was not enough at the 1024
    canvas.
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.bfloat16
    trainable: bool = False
    momentum: float = 0.1  # torch BatchNorm2d default

    @nn.compact
    def __call__(self, x):
        ones = lambda *_: jnp.ones((self.features,), jnp.float32)
        zeros = lambda *_: jnp.zeros((self.features,), jnp.float32)
        if not self.trainable:
            weight = self.variable("frozen", "weight", ones).value
            bias = self.variable("frozen", "bias", zeros).value
            mean = self.variable("frozen", "mean", zeros).value
            var = self.variable("frozen", "var", ones).value
            scale = weight * jax.lax.rsqrt(var + self.eps)
            shift = bias - mean * scale
            return x * scale.astype(self.dtype) + shift.astype(self.dtype)

        weight = self.param("weight", nn.initializers.ones,
                            (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean_v = self.variable("frozen", "mean", zeros)
        var_v = self.variable("frozen", "var", ones)
        training = self.is_mutable_collection("frozen")
        xf = x.astype(jnp.float32)
        if training:
            m = jnp.mean(xf, axis=(0, 1, 2))
            v = jnp.var(xf, axis=(0, 1, 2))
            if not self.is_initializing():
                # torch stores the UNBIASED variance in running_var.
                n = xf.shape[0] * xf.shape[1] * xf.shape[2]
                unbiased = v * (n / max(n - 1, 1))
                mean_v.value = ((1 - self.momentum) * mean_v.value
                                + self.momentum * jax.lax.stop_gradient(m))
                var_v.value = ((1 - self.momentum) * var_v.value
                               + self.momentum
                               * jax.lax.stop_gradient(unbiased))
        else:
            m, v = mean_v.value, var_v.value
        y = (xf - m) * jax.lax.rsqrt(v + self.eps) * weight + bias
        return y.astype(self.dtype)


class StemConv(nn.Module):
    """The ResNet stem 7x7/s2 conv, with an MXU-friendly evaluation path.

    The parameter is the standard ``[7, 7, 3, 64]`` HWIO kernel at the flax
    path ``conv1/kernel`` (checkpoint- and torchvision-import-compatible).
    With ``space_to_depth`` the conv is evaluated as an EXACTLY equivalent
    4x4/s1 conv over 2x2 space-to-depth input (12 channels): a C=3 conv
    occupies ~3/128 of the MXU's contraction lanes; C=12 is 4x denser.

    Derivation: ``out(i,j) = sum_{u,v} k[u,v] X[2i+u-3, 2j+v-3]``.  Pad the
    input by (4, 2) rows/cols, so the tap position becomes
    ``p = 2i + (u+1) = 2(i+bu) + py`` with ``u + 1 = 2 bu + py`` — kernel
    tap ``u`` lands in space-to-depth block ``bu`` phase ``py``.  Padding
    the 7-tap kernel with one leading zero makes it 8 = 4 blocks x 2 phases.
    """

    dtype: Dtype = jnp.bfloat16
    space_to_depth: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out",
                                             "truncated_normal"),
            (7, 7, 3, 64), jnp.float32)
        if not self.space_to_depth:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        b, h, w, c = x.shape
        assert h % 2 == 0 and w % 2 == 0 and c == 3
        # Input: pad (4, 2) and fold 2x2 blocks into channels -> 12.
        xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
        hp, wp = h + 6, w + 6
        xs = xp.reshape(b, hp // 2, 2, wp // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2,
                                                    4 * c)
        # Kernel: one leading zero row/col (7 -> 8 taps), then fold the
        # 2-phase structure into the input-channel dim -> [4, 4, 12, 64].
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        ks = kp.reshape(4, 2, 4, 2, c, 64)
        ks = ks.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, 64)
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), ks.astype(self.dtype),
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


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
    # Evaluate the 7x7/s2 stem as an equivalent 4x4/s1 conv on 2x2
    # space-to-depth input (the MLPerf ResNet trick): a C=3 conv runs the
    # MXU at ~3/128 occupancy; C=12 quadruples it.  Exactly equivalent math
    # (see tests/test_model.py); the parameter stays in the standard
    # [7, 7, 3, 64] layout so checkpoints and torchvision imports are
    # unaffected.  Off by default: measured net negative at 1024x1024
    # (the input-layout transform outweighs the conv saving).
    stem_space_to_depth: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        freeze_from = 5 - self.trainable_stages  # components [0, freeze_from) frozen

        def maybe_freeze(h, component_idx):
            # Stop gradients flowing below frozen components: their params get
            # zero grad and XLA drops the whole backward subgraph.
            return jax.lax.stop_gradient(h) if component_idx < freeze_from else h

        # Stem
        h = StemConv(dtype=self.dtype,
                     space_to_depth=self.stem_space_to_depth,
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
