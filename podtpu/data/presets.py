"""Augmentation policy presets.

Counterpart of the reference's ``DetectionPresetTrain``
(`miso/object_detection/engine/presets.py:5-57`): named policies composing
the device-side transforms in :mod:`podtpu.ops.image_ops`.

* ``miso``   — the reference pipeline's default (hflip + vflip +
  photometric distort; `miso/object_detection/transforms.py:4-16`);
* ``hflip``  — horizontal flip only (presets.py:8-12);
* ``lsj``    — large-scale jitter 0.1-2.0 + flips (presets.py:13-25);
* ``multiscale`` — random rescale 0.5-1.25 + flips (in place of the
  reference's RandomShortestSize list, which is moot on a static canvas);
* ``ssd``    — photometric distort + zoom-out + IoU crop + hflip
  (presets.py:26-35);
* ``ssdlite``— IoU crop + hflip (presets.py:36-42);
* ``none``   — evaluation (no augmentation).

Every policy is a pure function ``(rng, image, boxes, valid) ->
(image, boxes, valid)`` on the fixed canvas; it runs inside the jitted train
step and vmaps over the batch.  Optional per-gt targets ride along: ``masks``
(bitmaps follow the same geometry) and ``keypoints`` ([G, K, 3] (x, y, v)
triples — flips mirror the coordinates, with an optional left/right index
permutation for hflip; geometric policies reuse the boxes' affine and mark
points that leave the canvas invisible).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from podtpu.ops import image_ops as T

AugmentFn = Callable


def _flip_kps_h(kps, width, hflip_inds=None):
    x = width - kps[..., 0]
    out = jnp.stack([x, kps[..., 1], kps[..., 2]], axis=-1)
    if hflip_inds is not None and len(hflip_inds):
        # Left/right joint swap (torchvision's keypoint hflip recipe).
        out = out[:, jnp.asarray(hflip_inds, jnp.int32), :]
    return out


def _flip_kps_v(kps, height):
    y = height - kps[..., 1]
    return jnp.stack([kps[..., 0], y, kps[..., 2]], axis=-1)


def _flips(rng, image, boxes, hflip_prob=0.5, vflip_prob=0.5, masks=None,
           keypoints=None, kp_hflip_inds=None):
    h, w = image.shape[0], image.shape[1]
    k1, k2 = jax.random.split(rng)
    fimg, fbox = T.hflip(image, boxes, float(w))
    do = jax.random.uniform(k1) < hflip_prob
    image = jnp.where(do, fimg, image)
    boxes = jnp.where(do, fbox, boxes)
    if masks is not None:
        masks = jnp.where(do, masks[:, :, ::-1], masks)
    if keypoints is not None:
        keypoints = jnp.where(
            do, _flip_kps_h(keypoints, float(w), kp_hflip_inds), keypoints)
    fimg, fbox = T.vflip(image, boxes, float(h))
    do = jax.random.uniform(k2) < vflip_prob
    image = jnp.where(do, fimg, image)
    boxes = jnp.where(do, fbox, boxes)
    if masks is not None:
        masks = jnp.where(do, masks[:, ::-1, :], masks)
    if keypoints is not None:
        keypoints = jnp.where(do, _flip_kps_v(keypoints, float(h)),
                              keypoints)
    return image, boxes, masks, keypoints


def miso_policy(rng, image, boxes, valid, masks=None, keypoints=None,
                distort=True, kp_hflip_inds=None, vflip_prob=0.5):
    """``vflip_prob`` is forced to 0 by the step builders when a chiral
    keypoint skeleton is configured (a non-identity hflip permutation
    exists, but no vertical remap does)."""
    k1, k2 = jax.random.split(rng)
    image, boxes, masks, keypoints = _flips(
        k1, image, boxes, vflip_prob=vflip_prob, masks=masks,
        keypoints=keypoints, kp_hflip_inds=kp_hflip_inds)
    if distort:
        image = T.photometric_distort(k2, image)
    return image, boxes, valid, masks, keypoints


def hflip_policy(rng, image, boxes, valid, masks=None, keypoints=None,
                 kp_hflip_inds=None):
    image, boxes, masks, keypoints = _flips(
        rng, image, boxes, vflip_prob=0.0, masks=masks, keypoints=keypoints,
        kp_hflip_inds=kp_hflip_inds)
    return image, boxes, valid, masks, keypoints


def lsj_policy(rng, image, boxes, valid, masks=None, keypoints=None,
               kp_hflip_inds=None):
    k1, k2 = jax.random.split(rng)
    image, boxes, masks, keypoints = T.scale_jitter(
        k1, image, boxes, (0.1, 2.0), masks=masks, keypoints=keypoints)
    image, boxes, masks, keypoints = _flips(
        k2, image, boxes, vflip_prob=0.0, masks=masks, keypoints=keypoints,
        kp_hflip_inds=kp_hflip_inds)
    return image, boxes, _revalidate(boxes, valid), masks, keypoints


def multiscale_policy(rng, image, boxes, valid, masks=None, keypoints=None,
                      kp_hflip_inds=None):
    k1, k2 = jax.random.split(rng)
    image, boxes, masks, keypoints = T.scale_jitter(
        k1, image, boxes, (0.5, 1.25), masks=masks, keypoints=keypoints)
    image, boxes, masks, keypoints = _flips(
        k2, image, boxes, vflip_prob=0.0, masks=masks, keypoints=keypoints,
        kp_hflip_inds=kp_hflip_inds)
    return image, boxes, _revalidate(boxes, valid), masks, keypoints


def ssd_policy(rng, image, boxes, valid, masks=None, keypoints=None,
               kp_hflip_inds=None):
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    image = T.photometric_distort(k1, image)
    do_zoom = jax.random.uniform(k2) < 0.5
    zimg, zbox, zmask, zkp = T.zoom_out(k3, image, boxes, masks=masks,
                                        keypoints=keypoints)
    image = jnp.where(do_zoom, zimg, image)
    boxes = jnp.where(do_zoom, zbox, boxes)
    if masks is not None:
        masks = jnp.where(do_zoom, zmask, masks)
    if keypoints is not None:
        keypoints = jnp.where(do_zoom, zkp, keypoints)
    image, boxes, valid, masks, keypoints = T.iou_crop(
        k4, image, boxes, valid, masks=masks, keypoints=keypoints)
    image, boxes, masks, keypoints = _flips(
        k5, image, boxes, vflip_prob=0.0, masks=masks, keypoints=keypoints,
        kp_hflip_inds=kp_hflip_inds)
    return image, boxes, _revalidate(boxes, valid), masks, keypoints


def ssdlite_policy(rng, image, boxes, valid, masks=None, keypoints=None,
                   kp_hflip_inds=None):
    k1, k2 = jax.random.split(rng)
    image, boxes, valid, masks, keypoints = T.iou_crop(
        k1, image, boxes, valid, masks=masks, keypoints=keypoints)
    image, boxes, masks, keypoints = _flips(
        k2, image, boxes, vflip_prob=0.0, masks=masks, keypoints=keypoints,
        kp_hflip_inds=kp_hflip_inds)
    return image, boxes, _revalidate(boxes, valid), masks, keypoints


def none_policy(rng, image, boxes, valid, masks=None, keypoints=None,
                kp_hflip_inds=None):
    return image, boxes, valid, masks, keypoints


def _revalidate(boxes, valid):
    """Drop boxes that degenerate after geometric transforms."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return valid & (w > 1.0) & (h > 1.0)


POLICIES = {
    "miso": miso_policy,
    "hflip": hflip_policy,
    "lsj": lsj_policy,
    "multiscale": multiscale_policy,
    "ssd": ssd_policy,
    "ssdlite": ssdlite_policy,
    "none": none_policy,
}


def policy_kwargs(cfg) -> dict:
    """Per-config policy kwargs — the ONE place the train-step builders
    (single-device and DP) derive them, so the chiral-skeleton rules can't
    drift between the two:

    * 'miso' forwards the photometric-distort switch;
    * a configured keypoint hflip permutation is passed through, and a
      NON-identity one (chiral skeleton) disables the miso policy's
      vertical flip (no vertical joint remap exists).
    """
    kw = {}
    if cfg.data.aug_policy == "miso":
        kw["distort"] = cfg.data.photometric_distort
    if cfg.model.with_keypoints and cfg.model.keypoint_hflip_inds:
        inds = tuple(cfg.model.keypoint_hflip_inds)
        kw["kp_hflip_inds"] = inds
        if cfg.data.aug_policy == "miso" \
                and inds != tuple(range(len(inds))):
            kw["vflip_prob"] = 0.0
    return kw


def get_policy(name: str) -> AugmentFn:
    if name not in POLICIES:
        raise ValueError(
            f"Unknown augmentation policy {name!r}; "
            f"choose from {sorted(POLICIES)}")
    return POLICIES[name]


def augment_batch_policy(policy: AugmentFn, rng, images, boxes, valid,
                         masks=None, keypoints=None, **kw):
    """vmap a per-image policy over the batch.

    Returns (images, boxes, valid, masks, keypoints) — masks/keypoints are
    None when not given.
    """
    rngs = jax.random.split(rng, images.shape[0])
    if masks is None and keypoints is None:
        out = jax.vmap(
            lambda r, i, b, v: policy(r, i, b, v, masks=None,
                                      keypoints=None, **kw)[:3])(
            rngs, images, boxes, valid)
        return out + (None, None)
    if keypoints is None:
        out = jax.vmap(
            lambda r, i, b, v, m: policy(r, i, b, v, masks=m,
                                         keypoints=None, **kw)[:4])(
            rngs, images, boxes, valid, masks)
        return out + (None,)
    if masks is None:
        i_, b_, v_, _, k_ = jax.vmap(
            lambda r, i, b, v, k: policy(r, i, b, v, masks=None,
                                         keypoints=k, **kw))(
            rngs, images, boxes, valid, keypoints)
        return i_, b_, v_, None, k_
    return jax.vmap(
        lambda r, i, b, v, m, k: policy(r, i, b, v, masks=m, keypoints=k,
                                        **kw))(
        rngs, images, boxes, valid, masks, keypoints)
