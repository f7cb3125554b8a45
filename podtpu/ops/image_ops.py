"""Device-side image ops: normalization and batched augmentations.

TPU-native replacement for the reference's augmentation pipeline
(`miso/object_detection/transforms.py:4-16`: ToTensor + hflip(0.5) +
vflip(0.5) + RandomPhotometricDistort, backed by the vendored target-aware
transforms in `miso/object_detection/engine/transforms.py:31-72,251-308`).

Instead of per-image host-side PIL/torch ops inside DataLoader workers, the
whole augmentation runs INSIDE the jitted train step on device: flips are
lane reversals, photometric distortion is elementwise math — all batched and
fused by XLA, leaving the host loader with decode+resize only.

Boxes ride along: flips mirror the xyxy coordinates; photometric ops leave
them untouched.  Everything is static-shape and vmapped over the batch.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def hflip(image: jnp.ndarray, boxes: jnp.ndarray, width: float):
    """Horizontal flip of one HWC image + xyxy boxes."""
    flipped = image[:, ::-1, :]
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    fboxes = jnp.stack([width - x2, y1, width - x1, y2], axis=-1)
    return flipped, fboxes


def vflip(image: jnp.ndarray, boxes: jnp.ndarray, height: float):
    """Vertical flip of one HWC image + xyxy boxes."""
    flipped = image[::-1, :, :]
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    fboxes = jnp.stack([x1, height - y2, x2, height - y1], axis=-1)
    return flipped, fboxes


# -- photometric distortion ---------------------------------------------------

def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rng = maxc - minc
    s = jnp.where(maxc > 0, rng / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(rng, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(rng == 0, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    rgb = jnp.stack([
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q]),
    ], axis=-1)
    return rgb


def photometric_distort(rng: jax.Array, image: jnp.ndarray,
                        p: float = 0.5) -> jnp.ndarray:
    """Random brightness/contrast/saturation/hue jitter + channel permute.

    Ranges follow the torchvision ``RandomPhotometricDistort`` defaults the
    reference uses (brightness 0.875-1.125, contrast 0.5-1.5, saturation
    0.5-1.5, hue +-18 deg), each applied with probability ``p``; contrast is
    applied before or after saturation/hue with a 50% coin, and channels are
    randomly permuted with probability ``p``.  Input/output in [0, 1].
    """
    keys = jax.random.split(rng, 12)

    def maybe(k, img, fn):
        return jnp.where(jax.random.uniform(k) < p, fn(img), img)

    def brightness(img):
        f = jax.random.uniform(keys[1], (), minval=0.875, maxval=1.125)
        return img * f

    def contrast(img):
        f = jax.random.uniform(keys[2], (), minval=0.5, maxval=1.5)
        # Greyscale mean (ITU-R 601) as the pivot, like torchvision.
        grey = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2]).mean()
        return (img - grey) * f + grey

    def saturation(img):
        f = jax.random.uniform(keys[3], (), minval=0.5, maxval=1.5)
        grey = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2])[..., None]
        return (img - grey) * f + grey

    def hue(img):
        shift = jax.random.uniform(keys[4], (), minval=-18 / 360.0,
                                   maxval=18 / 360.0)
        hsv = rgb_to_hsv(jnp.clip(img, 0.0, 1.0))
        hsv = hsv.at[..., 0].set((hsv[..., 0] + shift) % 1.0)
        return hsv_to_rgb(hsv)

    img = maybe(keys[5], image, brightness)
    contrast_first = jax.random.uniform(keys[6]) < 0.5
    img = jnp.where(contrast_first, maybe(keys[7], img, contrast), img)
    img = maybe(keys[8], img, saturation)
    img = maybe(keys[9], img, hue)
    img = jnp.where(contrast_first, img, maybe(keys[7], img, contrast))
    # Random channel permutation.
    perm = jax.random.permutation(keys[10], 3)
    img = jnp.where(jax.random.uniform(keys[11]) < p, img[..., perm], img)
    return jnp.clip(img, 0.0, 1.0)


def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,       # [B, H, W, 3] float in [0,1]
    boxes: jnp.ndarray,        # [B, G, 4] xyxy canvas coords
    hflip_prob: float = 0.5,
    vflip_prob: float = 0.5,
    distort: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train-time augmentation for a whole batch, on device."""
    h, w = images.shape[1], images.shape[2]

    def per_image(r, img, bxs):
        k1, k2, k3 = jax.random.split(r, 3)
        fimg, fbox = hflip(img, bxs, float(w))
        do_h = jax.random.uniform(k1) < hflip_prob
        img = jnp.where(do_h, fimg, img)
        bxs = jnp.where(do_h, fbox, bxs)
        fimg, fbox = vflip(img, bxs, float(h))
        do_v = jax.random.uniform(k2) < vflip_prob
        img = jnp.where(do_v, fimg, img)
        bxs = jnp.where(do_v, fbox, bxs)
        if distort:
            img = photometric_distort(k3, img)
        return img, bxs

    rngs = jax.random.split(rng, images.shape[0])
    return jax.vmap(per_image)(rngs, images, boxes)
