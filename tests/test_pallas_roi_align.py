"""Pallas RoIAlign kernels vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.ops.roi_align import flatten_levels, multilevel_roi_align
from podtpu.ops.pallas.roi_align_kernel import batched_roi_align_pallas

STRIDES = (4, 8, 16, 32)


def setup_features(seed=0, c=8, batch=1):
    rng = np.random.default_rng(seed)
    feats = tuple(
        jnp.asarray(rng.normal(size=(batch, 32 // (2 ** i), 32 // (2 ** i),
                                     c)).astype(np.float32))
        for i in range(4))
    return feats


def reference(feats, rois):
    flat, geom = flatten_levels(list(feats))
    return jax.vmap(
        lambda f, r: multilevel_roi_align(f, geom, r, strides=STRIDES)
    )(flat, rois)


def canonical_rois(rng, n):
    """RoIs whose window span fits WIN at their assigned level."""
    out = []
    for _ in range(n):
        size = float(rng.uniform(20, 300))
        ar = float(rng.uniform(0.5, 2.0))
        w = size * np.sqrt(ar)
        h = size / np.sqrt(ar)
        x = float(rng.uniform(0, max(128 - w, 1)))
        y = float(rng.uniform(0, max(128 - h, 1)))
        out.append([x, y, x + w, y + h])
    return np.asarray(out, np.float32)


class TestPallasRoiAlign:
    def test_matches_xla_reference(self):
        rng = np.random.default_rng(1)
        feats = setup_features()
        rois = jnp.asarray(canonical_rois(rng, 16)[None])
        want = reference(feats, rois)
        got = batched_roi_align_pallas(feats, rois, STRIDES)
        assert got.shape == want.shape
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-4), \
            float(np.abs(np.asarray(got) - np.asarray(want)).max())

    def test_batched(self):
        rng = np.random.default_rng(2)
        feats = setup_features(seed=2, batch=3)
        rois = jnp.asarray(np.stack([canonical_rois(rng, 8)
                                     for _ in range(3)]))
        want = reference(feats, rois)
        got = batched_roi_align_pallas(feats, rois, STRIDES)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_degenerate_and_edge_rois(self):
        feats = setup_features(seed=3)
        rois = jnp.asarray([[
            [0, 0, 0, 0],              # degenerate (min-size 1 rule)
            [0, 0, 127, 127],          # full image
            [-10, -10, 20, 20],        # partially outside
            [120, 120, 140, 140],      # off the edge
        ]], jnp.float32)
        want = reference(feats, rois)
        got = batched_roi_align_pallas(feats, rois, STRIDES)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    def test_gradient_matches_reference(self):
        rng = np.random.default_rng(4)
        feats = setup_features(seed=4, batch=2)
        rois = jnp.asarray(np.stack([canonical_rois(rng, 6)
                                     for _ in range(2)]))

        def loss_ref(fs):
            return jnp.sum(reference(fs, rois) ** 2)

        def loss_pal(fs):
            return jnp.sum(batched_roi_align_pallas(fs, rois, STRIDES) ** 2)

        g_ref = jax.grad(loss_ref)(feats)
        g_pal = jax.grad(loss_pal)(feats)
        for a, b, in zip(g_ref, g_pal):
            assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-3), \
                float(np.abs(np.asarray(a) - np.asarray(b)).max())

    def test_jit_compatible(self):
        rng = np.random.default_rng(5)
        feats = setup_features(seed=5)
        rois = jnp.asarray(canonical_rois(rng, 8)[None])
        f = jax.jit(lambda fs, r: batched_roi_align_pallas(fs, r, STRIDES))
        got = f(feats, rois)
        want = reference(feats, rois)
        assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-4)
