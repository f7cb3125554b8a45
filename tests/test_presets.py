"""Augmentation transform + policy tests (device-side, fixed canvas)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.data.presets import POLICIES, augment_batch_policy, get_policy
from podtpu.ops import image_ops as T


def sample_image(seed=0, size=64):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(0, 1, (size, size, 3)), jnp.float32)
    boxes = jnp.asarray([[10, 20, 30, 50], [40, 8, 60, 24]], jnp.float32)
    valid = jnp.asarray([True, True])
    return img, boxes, valid


class TestTransforms:
    def test_hflip_roundtrip(self):
        img, boxes, _ = sample_image()
        fimg, fbox = T.hflip(img, boxes, 64.0)
        bimg, bbox = T.hflip(fimg, fbox, 64.0)
        assert np.allclose(bimg, img)
        assert np.allclose(bbox, boxes)
        # Flipped box actually mirrors.
        assert float(fbox[0, 0]) == pytest.approx(64 - 30)

    def test_vflip_roundtrip(self):
        img, boxes, _ = sample_image()
        fimg, fbox = T.vflip(img, boxes, 64.0)
        bimg, bbox = T.vflip(fimg, fbox, 64.0)
        assert np.allclose(bimg, img)
        assert np.allclose(bbox, boxes)

    def test_transpose(self):
        img, boxes, _ = sample_image()
        timg, tbox = T.random_transpose(img, boxes)
        assert timg.shape == img.shape
        assert np.allclose(tbox[0], [20, 10, 50, 30])
        assert np.allclose(np.asarray(timg)[3, 7], np.asarray(img)[7, 3])

    def test_scale_jitter_boxes_follow(self):
        img, boxes, _ = sample_image()
        # Deterministic scale via fixed key; just check invariants.
        jimg, jbox, _, _ = T.scale_jitter(jax.random.key(0), img, boxes)
        assert jimg.shape == img.shape
        assert float(jbox.min()) >= 0.0
        assert float(jbox.max()) <= 64.0

    def test_zoom_out_shrinks_boxes(self):
        img, boxes, _ = sample_image()
        zimg, zbox, _, _ = T.zoom_out(jax.random.key(1), img, boxes,
                                      (2.0, 2.0))
        w0 = float(boxes[0, 2] - boxes[0, 0])
        w1 = float(zbox[0, 2] - zbox[0, 0])
        assert w1 == pytest.approx(w0 / 2, rel=1e-3)

    def test_iou_crop_valid_masks(self):
        img, boxes, valid = sample_image()
        cimg, cbox, cvalid, _, _ = T.iou_crop(jax.random.key(2), img,
                                              boxes, valid)
        assert cimg.shape == img.shape
        assert cvalid.shape == valid.shape
        assert float(cbox.min()) >= 0.0

    def test_masks_follow_geometry(self):
        """A gt mask bitmap tracks its box through zoom-out exactly: the
        resampled mask's bounding box matches the transformed gt box (on the
        half-resolution mask grid)."""
        img, _, _ = sample_image()
        boxes = jnp.asarray([[16, 16, 48, 48]], jnp.float32)
        masks = jnp.zeros((1, 32, 32), jnp.float32).at[0, 8:24, 8:24].set(1.0)
        zimg, zbox, zmask, _ = T.zoom_out(jax.random.key(5), img, boxes,
                                          (2.0, 2.0), masks=masks)
        on = np.argwhere(np.asarray(zmask[0]) > 0.5)
        assert len(on) > 0
        (y0, x0), (y1, x1) = on.min(0), on.max(0)
        # Mask grid is stride 2: grid bbox ~= box / 2 (within a pixel).
        bx = np.asarray(zbox[0]) / 2.0
        assert abs(x0 - bx[0]) <= 1.5 and abs(y0 - bx[1]) <= 1.5
        assert abs(x1 + 1 - bx[2]) <= 1.5 and abs(y1 + 1 - bx[3]) <= 1.5

    def test_lsj_policy_carries_masks(self):
        img, boxes, valid = sample_image()
        masks = jnp.zeros((2, 32, 32), jnp.float32).at[0, 5:15, 10:15].set(1.0)
        fn = get_policy("lsj")
        oi, ob, ov, om, _ = augment_batch_policy(
            fn, jax.random.key(1), img[None], boxes[None], valid[None],
            masks=masks[None])
        assert om is not None and om.shape == (1, 2, 32, 32)
        assert np.isfinite(np.asarray(om)).all()

    @pytest.mark.parametrize("name", ["multiscale", "ssd", "ssdlite"])
    def test_geometric_policies_accept_masks(self, name):
        img, boxes, valid = sample_image()
        masks = jnp.zeros((2, 32, 32), jnp.float32).at[1, 4:12, 20:30].set(1.0)
        fn = get_policy(name)
        oi, ob, ov, om, _ = augment_batch_policy(
            fn, jax.random.key(2), img[None], boxes[None], valid[None],
            masks=masks[None])
        assert om is not None and om.shape == (1, 2, 32, 32)

    def test_photometric_preserves_shape_and_range(self):
        img, _, _ = sample_image()
        out = T.photometric_distort(jax.random.key(3), img)
        assert out.shape == img.shape
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_hsv_roundtrip(self):
        rng = np.random.default_rng(4)
        rgb = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)), jnp.float32)
        back = T.hsv_to_rgb(T.rgb_to_hsv(rgb))
        assert np.allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


class TestPolicies:
    @pytest.mark.parametrize("name", sorted(POLICIES))
    def test_policy_runs_and_keeps_shapes(self, name):
        img, boxes, valid = sample_image()
        images = img[None]
        fn = get_policy(name)
        out_img, out_box, out_valid, out_masks, _ = augment_batch_policy(
            fn, jax.random.key(0), images, boxes[None], valid[None])
        assert out_masks is None
        assert out_img.shape == images.shape
        assert out_box.shape == (1,) + boxes.shape
        assert out_valid.shape == (1,) + valid.shape
        assert np.isfinite(np.asarray(out_img)).all()

    def test_mask_aware_flips(self):
        img, boxes, valid = sample_image()
        masks = jnp.zeros((2, 32, 32), jnp.float32).at[:, :4, :4].set(1.0)
        from podtpu.data.presets import hflip_policy
        # Force a flip by trying keys until boxes change.
        for seed in range(20):
            oi, ob, ov, om, _ = augment_batch_policy(
                hflip_policy, jax.random.key(seed), img[None], boxes[None],
                valid[None], masks=masks[None])
            if not np.allclose(ob[0], boxes):
                # Flip happened: the mask corner moved to the right side.
                assert float(om[0, 0, 0, -1]) == 1.0
                assert float(om[0, 0, 0, 0]) == 0.0
                break
        else:
            raise AssertionError("no flip in 20 seeds")

    def test_unknown_policy_raises(self):
        with pytest.raises(ValueError):
            get_policy("nope")

    def test_none_policy_identity(self):
        img, boxes, valid = sample_image()
        fn = get_policy("none")
        out_img, out_box, out_valid, _, _ = augment_batch_policy(
            fn, jax.random.key(0), img[None], boxes[None], valid[None])
        assert np.allclose(out_img[0], img)
        assert np.allclose(out_box[0], boxes)
