"""Feature Pyramid Network (Flax linen).

TPU-native equivalent of the FPN inside torchvision's
``fasterrcnn_resnet50_fpn`` (`miso/object_detection/models.py:8`): lateral
1x1 convs on C2..C5, top-down nearest-neighbour upsampling, 3x3 smoothing
convs, plus a stride-2 max-pool P6 level for the RPN (torchvision's
``LastLevelMaxPool``).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn


# Optional per-feature-map sharding hook (set during tracing by
# podtpu.parallel.spatial): under spatial partitioning GSPMD otherwise
# invents inconsistent shardings for the coarse levels' lateral/post adds
# ("involuntary full rematerialization" — full-tensor replication on the
# mesh).  The hook pins each tap to an explicit, consistent spec.
_FEATURE_CONSTRAINT = None


def set_feature_constraint(fn):
    """Install ``fn(x) -> x`` applied to every FPN tap during tracing;
    returns the previous hook so callers can restore it."""
    global _FEATURE_CONSTRAINT
    prev = _FEATURE_CONSTRAINT
    _FEATURE_CONSTRAINT = fn
    return prev


def _constrain(x: jnp.ndarray) -> jnp.ndarray:
    return _FEATURE_CONSTRAINT(x) if _FEATURE_CONSTRAINT is not None else x


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample in NHWC (broadcast, no gather)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    out_channels: int = 256
    dtype: Any = jnp.bfloat16
    # Coarse extra levels: "pool" = stride-2 max-pool P6 (torchvision
    # ``LastLevelMaxPool``, the Faster R-CNN default) or "p6p7" = stride-2
    # convs P6 = conv(P5), P7 = conv(relu(P6)) (``LastLevelP6P7``, the
    # RetinaNet pyramid).
    extra: str = "pool"
    # Index of the finest input level (naming only: C{first_level}..C5 in,
    # P{first_level}.. out).  Faster R-CNN uses C2.., RetinaNet C3..
    first_level: int = 2
    # Frozen norm after each lateral/post conv (torchvision v2 recipe's
    # ``FeaturePyramidNetwork(norm_layer=...)``; stats import frozen).
    norm: bool = False
    # For extra="p6p7": build P6 from the RAW coarsest input (C5, e.g.
    # 2048ch — torchvision ``LastLevelP6P7(2048, 256)``, the
    # retinanet_resnet50_fpn_v2 wiring) instead of from P5
    # (``LastLevelP6P7(256, 256)``, the v1/FCOS wiring).
    p6_on_c5: bool = False

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        from podtpu.models.resnet import FrozenBatchNorm

        def conv(f, k, name, stride=1):
            def apply(x):
                y = nn.Conv(
                    f, (k, k), strides=(stride, stride),
                    padding=[(k // 2, k // 2)] * 2, dtype=self.dtype,
                    param_dtype=jnp.float32, use_bias=not self.norm,
                    name=name)(x)
                if self.norm:
                    y = FrozenBatchNorm(f, dtype=self.dtype,
                                        name=f"{name}_bn")(y)
                return y
            return apply

        f0 = self.first_level
        laterals = [
            _constrain(conv(self.out_channels, 1, f"lateral{i + f0}")(c))
            for i, c in enumerate(inputs)
        ]
        # Top-down pathway: resize coarse to the lateral's grid and add.
        # torchvision interpolates to the lateral's size: one stride apart
        # -> nearest 2x upsample; same stride (the MobileNetV3-FPN
        # extractor's two stride-32 taps) -> identity.
        tops = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = tops[-1]
            if up.shape[1] != lat.shape[1] or up.shape[2] != lat.shape[2]:
                up = upsample_nearest_2x(up)
                # Defensive crop if odd sizes appear (canvas /64 avoids it).
                up = up[:, : lat.shape[1], : lat.shape[2], :]
            tops.append(_constrain(lat + up))
        tops = tops[::-1]  # fine -> coarse

        outs = [
            _constrain(conv(self.out_channels, 3, f"post{i + f0}")(t))
            for i, t in enumerate(tops)
        ]
        if self.extra == "pool":
            # P6 for the RPN: stride-2 max pool of P5.
            p6 = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
            return tuple(outs) + (p6,)
        assert self.extra == "p6p7", self.extra
        p6_in = inputs[-1] if self.p6_on_c5 else outs[-1]
        p6 = conv(self.out_channels, 3, "p6", stride=2)(p6_in)
        p7 = conv(self.out_channels, 3, "p7", stride=2)(nn.relu(p6))
        return tuple(outs) + (p6, p7)
