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

from typing import Tuple

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


def random_transpose(image: jnp.ndarray, boxes: jnp.ndarray):
    """Transpose H/W (square canvas) + swap box coordinates.

    The reference ships this transform (engine/transforms.py:61-72; its use
    in the miso pipeline is commented out, transforms.py:11).
    """
    timg = jnp.swapaxes(image, 0, 1)
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    return timg, jnp.stack([y1, x1, y2, x2], axis=-1)


def scale_and_place(image: jnp.ndarray, boxes: jnp.ndarray,
                    scale, tx, ty) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Resample one HWC image by ``scale`` with translation (tx, ty) px on
    the same canvas (dynamic scale, static shapes) and transform boxes."""
    h, w = image.shape[0], image.shape[1]
    out = jax.image.scale_and_translate(
        image, (h, w, 3), (0, 1),
        jnp.stack([scale, scale]), jnp.stack([ty, tx]),
        method="linear", antialias=False)
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    nboxes = jnp.stack([x1 * scale + tx, y1 * scale + ty,
                        x2 * scale + tx, y2 * scale + ty], axis=-1)
    return out, nboxes


def scale_and_place_masks(masks: jnp.ndarray, scale, tx, ty,
                          image_h: int, image_w: int) -> jnp.ndarray:
    """Apply the same geometric transform to ``[G, mh, mw]`` gt mask bitmaps
    (the mask grid is the canvas at ``mask_stride``; the translation is
    given in IMAGE pixels and converted to grid units).  Counterpart of the
    reference's transforms carrying the "masks" target through geometric ops
    (`engine/transforms.py:311-436`)."""
    g, mh, mw = masks.shape
    return jax.image.scale_and_translate(
        masks, (g, mh, mw), (1, 2),
        jnp.stack([scale, scale]),
        jnp.stack([ty * mh / image_h, tx * mw / image_w]),
        method="linear", antialias=False)


def scale_and_place_keypoints(kps: jnp.ndarray, scale, tx, ty,
                              image_h: int, image_w: int) -> jnp.ndarray:
    """Apply the same geometric transform to ``[G, K, 3]`` (x, y, v)
    keypoints; points leaving the canvas become invisible (v=0)."""
    x = kps[..., 0] * scale + tx
    y = kps[..., 1] * scale + ty
    inside = (x >= 0) & (x < image_w) & (y >= 0) & (y < image_h)
    v = kps[..., 2] * inside.astype(kps.dtype)
    return jnp.stack([x, y, v], axis=-1)


def scale_jitter(rng: jax.Array, image: jnp.ndarray, boxes: jnp.ndarray,
                 scale_range: Tuple[float, float] = (0.1, 2.0), masks=None,
                 keypoints=None):
    """Large-scale jitter (the reference's ScaleJitter,
    engine/transforms.py:311-361): random global rescale on the fixed
    canvas; boxes (and masks/keypoints) follow; boxes clip."""
    h, w = image.shape[0], image.shape[1]
    s = jax.random.uniform(rng, (), minval=scale_range[0],
                           maxval=scale_range[1])
    img, bxs = scale_and_place(image, boxes, s, 0.0, 0.0)
    x1 = jnp.clip(bxs[..., 0], 0, w)
    y1 = jnp.clip(bxs[..., 1], 0, h)
    x2 = jnp.clip(bxs[..., 2], 0, w)
    y2 = jnp.clip(bxs[..., 3], 0, h)
    if masks is not None:
        masks = scale_and_place_masks(masks, s, 0.0, 0.0, h, w)
    if keypoints is not None:
        keypoints = scale_and_place_keypoints(keypoints, s, 0.0, 0.0, h, w)
    return img, jnp.stack([x1, y1, x2, y2], axis=-1), masks, keypoints


def zoom_out(rng: jax.Array, image: jnp.ndarray, boxes: jnp.ndarray,
             side_range: Tuple[float, float] = (1.0, 4.0), masks=None,
             keypoints=None):
    """Random zoom-out (the reference's RandomZoomOut,
    engine/transforms.py:188-248): shrink the content by 1/r and place it at
    a random offset on the canvas (zero fill)."""
    h, w = image.shape[0], image.shape[1]
    kr, kx, ky = jax.random.split(rng, 3)
    r = jax.random.uniform(kr, (), minval=side_range[0],
                           maxval=side_range[1])
    s = 1.0 / r
    tx = jax.random.uniform(kx, ()) * (w - w * s)
    ty = jax.random.uniform(ky, ()) * (h - h * s)
    img, bxs = scale_and_place(image, boxes, s, tx, ty)
    if masks is not None:
        masks = scale_and_place_masks(masks, s, tx, ty, h, w)
    if keypoints is not None:
        keypoints = scale_and_place_keypoints(keypoints, s, tx, ty, h, w)
    return img, bxs, masks, keypoints


def iou_crop(rng: jax.Array, image: jnp.ndarray, boxes: jnp.ndarray,
             valid: jnp.ndarray, trials: int = 20, masks=None,
             keypoints=None):
    """SSD-style jaccard-constrained random crop (the reference's
    RandomIoUCrop, engine/transforms.py:101-185), vectorised: sample
    ``trials`` candidate crops, keep the first whose IoU with some gt box
    meets a randomly drawn threshold and that contains at least one box
    centre; fall back to identity.  The crop is resampled back onto the
    fixed canvas; boxes whose centres fall outside are invalidated.
    """
    h, w = float(image.shape[0]), float(image.shape[1])
    k0, k1, k2, k3, k4 = jax.random.split(rng, 5)
    options = jnp.asarray([0.0, 0.1, 0.3, 0.5, 0.7, 0.9, -1.0])
    min_iou = options[jax.random.randint(k0, (), 0, len(options))]

    cw = jax.random.uniform(k1, (trials,), minval=0.3, maxval=1.0) * w
    chh = jax.random.uniform(k2, (trials,), minval=0.3, maxval=1.0) * h
    ar = cw / chh
    ar_ok = (ar >= 0.5) & (ar <= 2.0)
    cx = jax.random.uniform(k3, (trials,)) * (w - cw)
    cy = jax.random.uniform(k4, (trials,)) * (h - chh)
    crops = jnp.stack([cx, cy, cx + cw, cy + chh], axis=-1)  # [T, 4]

    from podtpu.ops.boxes import box_iou
    ious = box_iou(crops, boxes)                              # [T, G]
    ious = jnp.where(valid[None, :], ious, -1.0)
    centres_x = (boxes[:, 0] + boxes[:, 2]) / 2
    centres_y = (boxes[:, 1] + boxes[:, 3]) / 2
    inside = ((centres_x[None, :] >= crops[:, 0:1])
              & (centres_x[None, :] < crops[:, 2:3])
              & (centres_y[None, :] >= crops[:, 1:2])
              & (centres_y[None, :] < crops[:, 3:4])
              & valid[None, :])                                # [T, G]
    ok = ar_ok & jnp.any(inside, axis=1) & \
        (jnp.max(ious, axis=1) >= min_iou)
    first = jnp.argmax(ok)
    do_crop = jnp.any(ok) & (min_iou >= 0.0)

    crop = crops[first]
    scale = jnp.where(do_crop,
                      jnp.minimum(h / (crop[3] - crop[1]),
                                  w / (crop[2] - crop[0])), 1.0)
    tx = jnp.where(do_crop, -crop[0] * scale, 0.0)
    ty = jnp.where(do_crop, -crop[1] * scale, 0.0)
    img, bxs = scale_and_place(image, boxes, scale, tx, ty)
    x1 = jnp.clip(bxs[..., 0], 0, w)
    y1 = jnp.clip(bxs[..., 1], 0, h)
    x2 = jnp.clip(bxs[..., 2], 0, w)
    y2 = jnp.clip(bxs[..., 3], 0, h)
    nboxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    keep = jnp.where(do_crop, inside[first], valid)
    if masks is not None:
        masks = scale_and_place_masks(masks, scale, tx, ty,
                                      image.shape[0], image.shape[1])
    if keypoints is not None:
        keypoints = scale_and_place_keypoints(
            keypoints, scale, tx, ty, image.shape[0], image.shape[1])
    return img, nboxes, keep & valid, masks, keypoints


def copy_paste_batch(rng: jax.Array, images: jnp.ndarray,
                     boxes: jnp.ndarray, labels: jnp.ndarray,
                     valid: jnp.ndarray, masks=None,
                     region_stride: int = 8):
    """Simple Copy-Paste (the reference's SimpleCopyPaste,
    engine/transforms.py:475-626), batch-level: each image receives the
    instances of its batch neighbour (roll by 1).

    With ``masks`` the pasted region is the union of the neighbour's
    instance masks; without, the union of its boxes (box-paste).  Ground
    truth is merged (originals first, pasted appended) and re-compacted to
    the fixed capacity; original masks are clipped by the pasted region.
    Simplification vs torchvision: original BOXES are kept as-is rather
    than recomputed from occluded masks.
    """
    b, h, w, _ = images.shape
    g = boxes.shape[1]
    src_img = jnp.roll(images, 1, axis=0)
    src_boxes = jnp.roll(boxes, 1, axis=0)
    src_labels = jnp.roll(labels, 1, axis=0)
    src_valid = jnp.roll(valid, 1, axis=0)
    src_masks = jnp.roll(masks, 1, axis=0) if masks is not None else None

    # Randomly drop ~half the pasted instances (torchvision samples a
    # random subset).
    keep_paste = (jax.random.uniform(rng, (b, g)) < 0.5) & src_valid

    if src_masks is not None:
        region = jnp.any(src_masks * keep_paste[:, :, None, None] > 0.5,
                         axis=1)                                  # [B,mh,mw]
        mh, mw = region.shape[1], region.shape[2]
        sy, sx = h // mh, w // mw
    else:
        mh, mw = h // region_stride, w // region_stride
        sy = sx = region_stride
        yy = (jax.lax.broadcasted_iota(jnp.float32, (mh, mw), 0) + 0.5) * sy
        xx = (jax.lax.broadcasted_iota(jnp.float32, (mh, mw), 1) + 0.5) * sx
        inside = ((xx[None, None] >= src_boxes[:, :, 0, None, None])
                  & (xx[None, None] < src_boxes[:, :, 2, None, None])
                  & (yy[None, None] >= src_boxes[:, :, 1, None, None])
                  & (yy[None, None] < src_boxes[:, :, 3, None, None]))
        region = jnp.any(inside & keep_paste[:, :, None, None], axis=1)

    region_full = jnp.repeat(jnp.repeat(region, sy, axis=1), sx, axis=2)
    region_full = region_full[:, :h, :w, None]
    out_images = jnp.where(region_full, src_img, images)

    # Merge gt: originals first, pasted appended, compact to capacity G.
    all_boxes = jnp.concatenate([boxes, src_boxes], axis=1)
    all_labels = jnp.concatenate([labels, src_labels], axis=1)
    all_valid = jnp.concatenate([valid, keep_paste], axis=1)
    order = jnp.argsort(~all_valid, axis=1, stable=True)[:, :g]
    out_boxes = jnp.take_along_axis(all_boxes, order[:, :, None], axis=1)
    out_labels = jnp.take_along_axis(all_labels, order, axis=1)
    out_valid = jnp.take_along_axis(all_valid, order, axis=1)

    out_masks = None
    if masks is not None:
        clipped = masks * (1.0 - region[:, None].astype(masks.dtype))
        all_masks = jnp.concatenate([clipped, src_masks], axis=1)
        out_masks = jnp.take_along_axis(
            all_masks, order[:, :, None, None], axis=1)
    return out_images, out_boxes, out_labels, out_valid, out_masks
