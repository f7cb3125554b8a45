"""Crop classifier model (image classification head).

Fills the reference's ``miso/image_classification`` package, which ships
EMPTY (0-byte ``models.py``; SURVEY.md §2.1) yet is named in the project's
north star: a classifier for the object crops produced by ``crop-objects``.

Architecture: a compact ResNet (configurable depth) with trainable
BatchNorm-free design — GroupNorm is used instead so the model is
batch-size-independent and TPU-friendly (no cross-replica stat sync), with a
global-average-pool linear head.  bf16 compute / fp32 params like the
detector.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class ClassifierBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32, use_bias=False)
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], name="conv1", **kw)(x)
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                         param_dtype=jnp.float32, name="gn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2", **kw)(y)
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                         param_dtype=jnp.float32, name="gn2")(y)
        if x.shape[-1] != self.planes or self.stride != 1:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2,
                               name="proj", **kw)(x)
            identity = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                                    param_dtype=jnp.float32,
                                    name="gn_proj")(identity)
        return nn.relu(y + identity)


class CropClassifier(nn.Module):
    """ResNet-style classifier over fixed-size crops (default 128x128)."""

    num_classes: int
    stage_sizes: Sequence[int] = (2, 2, 2, 2)  # ResNet-18-ish
    width: int = 64
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """images [B, H, W, 3] in [0,1] -> logits [B, num_classes]."""
        mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
        h = ((x - mean) / std).astype(self.dtype)
        h = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="stem")(h)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                         param_dtype=jnp.float32, name="gn_stem")(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        planes = self.width
        for stage, blocks in enumerate(self.stage_sizes):
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                h = ClassifierBlock(planes, stride=stride, dtype=self.dtype,
                                    name=f"stage{stage + 1}_{b}")(h)
            planes *= 2
        h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        return nn.Dense(self.num_classes, param_dtype=jnp.float32,
                        name="head")(h)
