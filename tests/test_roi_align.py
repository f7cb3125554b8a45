"""RoIAlign vs a literal (looped) numpy oracle of the torchvision algorithm."""
import numpy as np
import pytest

import jax.numpy as jnp

from podtpu.ops.roi_align import (
    assign_levels,
    flatten_levels,
    multilevel_roi_align,
)


def roi_align_oracle(feat_hwc, rois, output_size, spatial_scale,
                     sampling_ratio, aligned=False):
    """Direct transcription of the roi_align sampling rules (looped, slow)."""
    H, W, C = feat_hwc.shape
    out = np.zeros((len(rois), output_size, output_size, C), np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0 = int(np.floor(y))
        x0 = int(np.floor(x))
        if y0 >= H - 1:
            y0 = max(H - 2, 0)
        if x0 >= W - 1:
            x0 = max(W - 2, 0)
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return ((1 - ly) * (1 - lx) * feat_hwc[y0, x0]
                + (1 - ly) * lx * feat_hwc[y0, x1]
                + ly * (1 - lx) * feat_hwc[y1, x0]
                + ly * lx * feat_hwc[y1, x1])

    shift = 0.5 if aligned else 0.0
    for k, roi in enumerate(rois):
        x1 = roi[0] * spatial_scale - shift
        y1 = roi[1] * spatial_scale - shift
        x2 = roi[2] * spatial_scale - shift
        y2 = roi[3] * spatial_scale - shift
        roi_w, roi_h = x2 - x1, y2 - y1
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bw, bh = roi_w / output_size, roi_h / output_size
        s = sampling_ratio
        for i in range(output_size):
            for j in range(output_size):
                acc = np.zeros(C)
                for p in range(s):
                    for q in range(s):
                        y = y1 + (i + (p + 0.5) / s) * bh
                        x = x1 + (j + (q + 0.5) / s) * bw
                        acc += bilinear(y, x)
                out[k, i, j] = acc / (s * s)
    return out


def run_single_level(feat, rois, stride, out_size=7, sampling_ratio=2,
                     min_level=2):
    flat, geom = flatten_levels([feat[None]])
    res = multilevel_roi_align(flat[0], geom, jnp.asarray(rois),
                               strides=(stride,), output_size=out_size,
                               sampling_ratio=sampling_ratio,
                               min_level=min_level)
    return np.asarray(res)


class TestRoiAlignSingleLevel:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_oracle_random(self, seed):
        rng = np.random.default_rng(seed)
        feat = rng.normal(size=(24, 20, 3)).astype(np.float32)
        rois = np.array([
            [4.0, 8.0, 60.0, 72.0],
            [0.0, 0.0, 16.0, 16.0],
            [10.0, 10.0, 79.0, 95.0],
            [30.5, 20.25, 50.75, 60.5],
        ], np.float32)
        got = run_single_level(jnp.asarray(feat), rois, stride=4)
        want = roi_align_oracle(feat, rois, 7, 1 / 4, 2)
        assert np.allclose(got, want, atol=1e-4)

    def test_out_of_bounds_rois(self):
        rng = np.random.default_rng(2)
        feat = rng.normal(size=(10, 10, 2)).astype(np.float32)
        rois = np.array([
            [-20.0, -20.0, 5.0, 5.0],     # partially outside
            [35.0, 35.0, 60.0, 60.0],     # fully outside (stride 4 -> cells 8.75+)
            [0.0, 0.0, 0.0, 0.0],         # degenerate
        ], np.float32)
        got = run_single_level(jnp.asarray(feat), rois, stride=4)
        want = roi_align_oracle(feat, rois, 7, 1 / 4, 2)
        assert np.allclose(got, want, atol=1e-4)

    def test_tiny_feature_map(self):
        feat = np.arange(4, dtype=np.float32).reshape(2, 2, 1)
        rois = np.array([[0, 0, 8, 8]], np.float32)
        got = run_single_level(jnp.asarray(feat), rois, stride=4)
        want = roi_align_oracle(feat, rois, 7, 1 / 4, 2)
        assert np.allclose(got, want, atol=1e-5)

    def test_chunked_path_equals_unchunked(self):
        rng = np.random.default_rng(3)
        feat = jnp.asarray(rng.normal(size=(16, 16, 4)).astype(np.float32))
        rois = jnp.asarray(random_rois(rng, 128, 64.0))
        flat, geom = flatten_levels([feat[None]])
        a = multilevel_roi_align(flat[0], geom, rois, strides=(4,),
                                 roi_chunk=64)
        b = multilevel_roi_align(flat[0], geom, rois, strides=(4,),
                                 roi_chunk=128)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def random_rois(rng, n, size):
    xy = rng.uniform(0, size * 0.7, (n, 2))
    wh = rng.uniform(4, size * 0.3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestMultiLevel:
    def test_level_assignment_canonical(self):
        # sqrt(area) == 224 -> canonical level 4 -> index 2 with min_level 2.
        boxes = jnp.asarray([
            [0, 0, 224, 224],
            [0, 0, 56, 56],      # sqrt=56 -> k=2 -> idx 0
            [0, 0, 111, 111],    # sqrt=111 -> floor(4 + log2(0.497)) = 2 -> wait
            [0, 0, 1000, 1000],  # clamps to max
            [0, 0, 1, 1],        # clamps to min
        ], jnp.float32)
        lvl = np.asarray(assign_levels(boxes, num_levels=4))
        assert lvl[0] == 2
        assert lvl[1] == 0
        assert lvl[3] == 3
        assert lvl[4] == 0

    def test_multilevel_matches_per_level_oracle(self):
        rng = np.random.default_rng(5)
        feats = [rng.normal(size=(32, 32, 3)).astype(np.float32),
                 rng.normal(size=(16, 16, 3)).astype(np.float32),
                 rng.normal(size=(8, 8, 3)).astype(np.float32),
                 rng.normal(size=(4, 4, 3)).astype(np.float32)]
        strides = (4, 8, 16, 32)
        # Mix of box scales so all levels are exercised.
        rois = np.concatenate([
            random_rois(rng, 4, 40),          # small -> P2
            random_rois(rng, 4, 120) + 2,     # medium
            np.array([[0, 0, 500, 500], [10, 10, 640, 600]], np.float32),
        ]).astype(np.float32)

        flat, geom = flatten_levels([f[None] for f in feats])
        got = np.asarray(multilevel_roi_align(
            flat[0], geom, jnp.asarray(rois), strides=strides))

        lvl = np.asarray(assign_levels(jnp.asarray(rois), 4))
        for k, roi in enumerate(rois):
            l = lvl[k]
            want = roi_align_oracle(feats[l], roi[None], 7, 1 / strides[l], 2)[0]
            assert np.allclose(got[k], want, atol=1e-4), f"roi {k} level {l}"
