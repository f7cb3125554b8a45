"""VGG16 SSD feature extractor (Flax linen).

TPU-native equivalent of torchvision's ``SSDFeatureExtractorVGG`` — the
backbone of ``ssd300_vgg16``, one of the torchvision-zoo detector families
the reference's vendored trainer dispatches to
(`miso/object_detection/engine/train.py:219-221`).  Architecture matches it
exactly so ImageNet/COCO ``.pth`` state_dicts convert 1:1
(models/weights.py::ssd_vgg16_key_map):

* VGG16 "D" convs through conv4_3 (pool3 in CEIL mode: 75 -> 38 at 300px);
* the conv4_3 output is L2-normalised per location and rescaled by a learned
  per-channel weight (init 20) — SSD's "L2Norm" layer;
* pool4 -> conv5_x -> pool5 (3x3 stride 1) -> dilated fc6 (3x3, dilation 6)
  -> fc7 (1x1), all ReLU;
* four extra blocks (1x1 reduce + 3x3, the middle two stride-2 padded, the
  last two unpadded) taking 19x19 -> 10 -> 5 -> 3 -> 1.

Returns SIX maps with channels (512, 1024, 512, 256, 256, 256).

TPU-first: NHWC, bf16 compute / fp32 params, max-pools as
``nn.max_pool`` reduce-windows (the ceil-mode pool pads with -inf), frozen
stages under ``stop_gradient`` so XLA prunes their backward graph
(torchvision ``trainable_backbone_layers`` semantics over the 5 conv
stages; the extras are always trainable).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# VGG16 configuration "D": channels per conv, grouped into the 5 stages.
STAGES: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))


class VGG16SSD(nn.Module):
    """VGG16 + SSD extras: ``[B, H, W, 3]`` -> 6 feature maps."""

    dtype: Dtype = jnp.bfloat16
    trainable_stages: int = 3  # of the 5 VGG conv stages, from the top

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        conv = lambda f, name, **kw2: nn.Conv(
            f, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            param_dtype=jnp.float32, name=name, **kw2)
        freeze_from = 5 - self.trainable_stages

        h = x
        for s, widths in enumerate(STAGES[:4], start=1):
            for i, w in enumerate(widths, start=1):
                h = nn.relu(conv(w, f"conv{s}_{i}")(h))
            if s < 4:
                # pool3 runs in ceil mode (the torchvision ssd300 tweak):
                # pad the bottom/right so 75 -> 38; pools 1-2 are exact.
                pad = [(0, h.shape[1] % 2), (0, h.shape[2] % 2)] if s == 3 \
                    else [(0, 0), (0, 0)]
                h = nn.max_pool(h, (2, 2), strides=(2, 2), padding=pad)
            if s <= freeze_from:
                h = jax.lax.stop_gradient(h)

        # L2Norm on conv4_3: per-location channel L2 normalisation with a
        # learned per-channel rescale (init 20, the SSD paper's trick to
        # tame conv4_3's larger activations).
        scale = self.param("l2norm_scale",
                           nn.initializers.constant(20.0), (h.shape[-1],),
                           jnp.float32)
        hf = h.astype(jnp.float32)
        norm = jax.lax.rsqrt(jnp.sum(hf * hf, axis=-1, keepdims=True) + 1e-12)
        out0 = (hf * norm * scale).astype(self.dtype)

        # Stage 5: pool4 -> conv5_x -> pool5 (3x3 s1 p1) -> fc6/fc7.
        h = nn.max_pool(h, (2, 2), strides=(2, 2))
        for i, w in enumerate(STAGES[4], start=1):
            h = nn.relu(conv(w, f"conv5_{i}")(h))
        if 5 <= freeze_from:
            h = jax.lax.stop_gradient(h)
        h = nn.max_pool(h, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
        h = nn.relu(nn.Conv(1024, (3, 3), padding=[(6, 6), (6, 6)],
                            kernel_dilation=(6, 6), dtype=self.dtype,
                            param_dtype=jnp.float32, name="fc6")(h))
        h = nn.relu(nn.Conv(1024, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32, name="fc7")(h))
        out1 = h

        # Extra blocks: 1x1 reduce + 3x3 (stride 2 padded / unpadded).
        def extra(h, mid, out_ch, stride, pad, name):
            h = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"{name}_1")(h))
            h = nn.relu(nn.Conv(out_ch, (3, 3), strides=(stride, stride),
                                padding=[(pad, pad)] * 2, dtype=self.dtype,
                                param_dtype=jnp.float32,
                                name=f"{name}_2")(h))
            return h

        out2 = extra(out1, 256, 512, 2, 1, "extra1")
        out3 = extra(out2, 128, 256, 2, 1, "extra2")
        out4 = extra(out3, 128, 256, 1, 0, "extra3")
        out5 = extra(out4, 128, 256, 1, 0, "extra4")
        return (out0, out1, out2, out3, out4, out5)


OUT_CHANNELS = (512, 1024, 512, 256, 256, 256)
