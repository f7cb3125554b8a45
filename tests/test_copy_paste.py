"""Simple Copy-Paste batch transform tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.ops.image_ops import copy_paste_batch


def make_batch(b=3, size=64, g=4, with_masks=False, seed=0):
    rng = np.random.default_rng(seed)
    images = jnp.asarray(
        np.stack([np.full((size, size, 3), i / b, np.float32)
                  for i in range(b)]))
    boxes = np.zeros((b, g, 4), np.float32)
    valid = np.zeros((b, g), bool)
    labels = np.zeros((b, g), np.int32)
    for i in range(b):
        n = 2
        for j in range(n):
            x, y = rng.integers(0, size - 20, 2)
            boxes[i, j] = [x, y, x + 16, y + 16]
            labels[i, j] = 1 + (i + j) % 2
            valid[i, j] = True
    masks = None
    if with_masks:
        mh = size // 8
        masks = np.zeros((b, g, mh, mh), np.float32)
        for i in range(b):
            for j in range(g):
                if valid[i, j]:
                    x1, y1, x2, y2 = (boxes[i, j] / 8).astype(int)
                    masks[i, j, y1:y2, x1:x2] = 1.0
        masks = jnp.asarray(masks)
    return images, jnp.asarray(boxes), jnp.asarray(labels), \
        jnp.asarray(valid), masks


class TestCopyPaste:
    def test_box_paste_merges_gt(self):
        images, boxes, labels, valid, _ = make_batch()
        out_img, out_box, out_lab, out_val, out_masks = copy_paste_batch(
            jax.random.key(0), images, boxes, labels, valid)
        assert out_img.shape == images.shape
        assert out_box.shape == boxes.shape
        assert out_masks is None
        # Valid count never decreases below the originals (originals kept).
        assert (np.asarray(out_val).sum(axis=1)
                >= np.asarray(valid).sum(axis=1)).all()
        # Valid entries packed first.
        v = np.asarray(out_val)
        for i in range(v.shape[0]):
            k = v[i].sum()
            assert v[i, :k].all() and not v[i, k:].any()

    def test_pasted_pixels_come_from_neighbour(self):
        images, boxes, labels, valid, _ = make_batch()
        # Try seeds until some instance is pasted into image 1.
        for seed in range(10):
            out_img, out_box, out_lab, out_val, _ = copy_paste_batch(
                jax.random.key(seed), images, boxes, labels, valid)
            v1 = np.asarray(out_val[1]).sum()
            if v1 > np.asarray(valid[1]).sum():
                # Pasted region must show image 0's constant value (0.0).
                img1 = np.asarray(out_img[1])
                assert (np.abs(img1 - 1 / 3) > 1e-3).any()
                return
        raise AssertionError("no paste happened in 10 seeds")

    def test_mask_paste_clips_original_masks(self):
        images, boxes, labels, valid, masks = make_batch(with_masks=True)
        out = copy_paste_batch(jax.random.key(1), images, boxes, labels,
                               valid, masks)
        out_img, out_box, out_lab, out_val, out_masks = out
        assert out_masks is not None
        assert out_masks.shape == (3, 4) + masks.shape[2:]
        # Mask values stay binary-ish in [0, 1].
        assert float(out_masks.min()) >= 0.0
        assert float(out_masks.max()) <= 1.0

    def test_jit_compatible(self):
        images, boxes, labels, valid, masks = make_batch(with_masks=True)
        f = jax.jit(lambda r, i, b, l, v, m: copy_paste_batch(r, i, b, l, v, m))
        out = f(jax.random.key(2), images, boxes, labels, valid, masks)
        assert np.isfinite(np.asarray(out[0])).all()
