"""Tests for box primitives, anchors, and NMS against python/numpy oracles."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.data.annotation import RectangleAnnotation
from podtpu.ops import anchors as anchor_lib
from podtpu.ops.boxes import (
    box_area,
    box_iou,
    clip_boxes,
    decode_boxes,
    encode_boxes,
    small_box_mask,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from podtpu.ops.nms import batched_nms_keep, nms_keep, nms_select


def random_boxes(rng, n, size=100.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(1, size / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestBoxOps:
    def test_iou_matches_data_model(self):
        rng = np.random.default_rng(0)
        a, b = random_boxes(rng, 8), random_boxes(rng, 5)
        got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
        for i in range(8):
            ra = RectangleAnnotation(a[i, 0], a[i, 1], a[i, 2] - a[i, 0],
                                     a[i, 3] - a[i, 1], "x")
            for j in range(5):
                rb = RectangleAnnotation(b[j, 0], b[j, 1], b[j, 2] - b[j, 0],
                                         b[j, 3] - b[j, 1], "x")
                assert got[i, j] == pytest.approx(ra.iou(rb), abs=1e-5)

    def test_area(self):
        b = jnp.asarray([[0, 0, 4, 5], [1, 1, 1, 1]], jnp.float32)
        assert np.allclose(box_area(b), [20, 0])

    def test_encode_decode_roundtrip(self):
        rng = np.random.default_rng(1)
        anchors = jnp.asarray(random_boxes(rng, 16))
        gt = jnp.asarray(random_boxes(rng, 16))
        for w in [(1.0, 1.0, 1.0, 1.0), (10.0, 10.0, 5.0, 5.0)]:
            codes = encode_boxes(gt, anchors, weights=w)
            back = decode_boxes(codes, anchors, weights=w)
            assert np.allclose(back, gt, atol=1e-3)

    def test_decode_clips_extreme_deltas(self):
        anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        codes = jnp.asarray([[0, 0, 50.0, 50.0]], jnp.float32)
        out = decode_boxes(codes, anchors)
        assert np.all(np.isfinite(out))
        # width capped at 10 * 1000/16
        assert float(out[0, 2] - out[0, 0]) == pytest.approx(10 * 1000 / 16, rel=1e-3)

    def test_clip_and_small(self):
        b = jnp.asarray([[-5, -5, 50, 200], [0, 0, 0.5, 30]], jnp.float32)
        c = clip_boxes(b, (100, 60))
        assert np.allclose(c, [[0, 0, 50, 100], [0, 0, 0.5, 30]])
        assert np.array_equal(small_box_mask(c, 1.0), [True, False])

    def test_xywh_conversions(self):
        b = jnp.asarray([[1, 2, 3, 4]], jnp.float32)
        assert np.allclose(xywh_to_xyxy(b), [[1, 2, 4, 6]])
        assert np.allclose(xyxy_to_xywh(xywh_to_xyxy(b)), b)


class TestAnchors:
    def test_cell_anchor_torchvision_values(self):
        # size 32, ratios (0.5, 1, 2) -> torchvision's rounded half-extents.
        got = anchor_lib.cell_anchors(32, (0.5, 1.0, 2.0))
        expect = np.array([
            [-23., -11., 23., 11.],
            [-16., -16., 16., 16.],
            [-11., -23., 11., 23.],
        ], np.float32)
        assert np.array_equal(got, expect)

    def test_grid_shape_and_stride(self):
        grids = anchor_lib.grid_anchors((64, 64), strides=(4, 8),
                                        sizes=(32, 64), aspect_ratios=(1.0,))
        assert grids[0].shape == (16 * 16, 4)
        assert grids[1].shape == (8 * 8, 4)
        # Second anchor at level 0 is the first shifted by stride in x.
        assert np.allclose(grids[0][1] - grids[0][0], [4, 0, 4, 0])
        # Anchor centred at its grid point.
        cx = (grids[0][0, 0] + grids[0][0, 2]) / 2
        assert cx == pytest.approx(0.0)

    def test_anchor_order_is_location_major(self):
        grids = anchor_lib.grid_anchors((8, 8), strides=(4,), sizes=(16,),
                                        aspect_ratios=(0.5, 1.0, 2.0))
        (g,) = grids
        assert g.shape == (2 * 2 * 3, 4)
        # First 3 anchors share the same centre (location 0,0).
        centres = (g[:3, :2] + g[:3, 2:]) / 2
        assert np.allclose(centres, 0.0)


def nms_oracle(boxes, scores, thresh, valid=None):
    """Plain-python greedy NMS (the reference semantics)."""
    n = len(boxes)
    if valid is None:
        valid = np.ones(n, bool)
    order = sorted(range(n), key=lambda i: (-scores[i], i))
    keep = np.zeros(n, bool)
    for i in order:
        if not valid[i]:
            continue
        ri = RectangleAnnotation(boxes[i, 0], boxes[i, 1],
                                 boxes[i, 2] - boxes[i, 0],
                                 boxes[i, 3] - boxes[i, 1], "x")
        ok = True
        for j in range(n):
            if keep[j]:
                rj = RectangleAnnotation(boxes[j, 0], boxes[j, 1],
                                         boxes[j, 2] - boxes[j, 0],
                                         boxes[j, 3] - boxes[j, 1], "x")
                if ri.iou(rj) > thresh:
                    ok = False
                    break
        keep[i] = ok
    return keep


class TestNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    @pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
    def test_matches_oracle(self, seed, thresh):
        rng = np.random.default_rng(seed)
        boxes = random_boxes(rng, 64, size=50.0)  # dense -> many overlaps
        scores = rng.uniform(0, 1, 64).astype(np.float32)
        got = np.asarray(nms_keep(jnp.asarray(boxes), jnp.asarray(scores), thresh))
        want = nms_oracle(boxes, scores, thresh)
        assert np.array_equal(got, want)

    def test_validity_mask(self):
        rng = np.random.default_rng(7)
        boxes = random_boxes(rng, 32, size=40.0)
        scores = rng.uniform(0, 1, 32).astype(np.float32)
        valid = rng.uniform(0, 1, 32) > 0.3
        got = np.asarray(nms_keep(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                                  valid=jnp.asarray(valid)))
        want = nms_oracle(boxes, scores, 0.5, valid)
        assert np.array_equal(got, want)
        assert not got[~valid].any()

    def test_identical_boxes_keep_first(self):
        boxes = jnp.asarray([[0, 0, 10, 10]] * 3, jnp.float32)
        scores = jnp.asarray([0.5, 0.5, 0.5])
        keep = np.asarray(nms_keep(boxes, scores, 0.5))
        assert keep.tolist() == [True, False, False]

    def test_batched_nms_classes_independent(self):
        boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.asarray([0.9, 0.8])
        idxs = jnp.asarray([0, 1])
        keep = np.asarray(batched_nms_keep(boxes, scores, idxs, 0.5))
        assert keep.tolist() == [True, True]
        keep_same = np.asarray(
            batched_nms_keep(boxes, scores, jnp.asarray([0, 0]), 0.5))
        assert keep_same.tolist() == [True, False]

    def test_nms_select_fixed_size(self):
        rng = np.random.default_rng(3)
        boxes = random_boxes(rng, 32, size=40.0)
        scores = rng.uniform(0, 1, 32).astype(np.float32)
        out_boxes, out_scores, out_valid = nms_select(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, k=8)
        assert out_boxes.shape == (8, 4)
        # Scores sorted descending on valid slots, zeros on invalid.
        sv = np.asarray(out_scores)[np.asarray(out_valid)]
        assert np.all(np.diff(sv) <= 1e-6)
        assert np.all(np.asarray(out_scores)[~np.asarray(out_valid)] == 0)

    def test_jit_compatible(self):
        f = jax.jit(lambda b, s: nms_keep(b, s, 0.5))
        rng = np.random.default_rng(0)
        boxes = jnp.asarray(random_boxes(rng, 16))
        scores = jnp.asarray(rng.uniform(0, 1, 16).astype(np.float32))
        keep = f(boxes, scores)
        assert keep.shape == (16,)
