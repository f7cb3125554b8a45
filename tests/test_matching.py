"""Matcher/sampler tests: matrix vs streamed matcher parity + sampler
invariants."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.ops.boxes import box_iou
from podtpu.ops.matching import (
    balanced_sample,
    balanced_sample_gather,
    match,
    match_streamed,
)


def random_boxes(rng, n, size=200.0):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(5, size / 3, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


class TestMatcherParity:
    @pytest.mark.parametrize("seed", range(4))
    @pytest.mark.parametrize("lq", [False, True])
    def test_streamed_equals_matrix(self, seed, lq):
        rng = np.random.default_rng(seed)
        anchors = jnp.asarray(random_boxes(rng, 300))
        gts = jnp.asarray(random_boxes(rng, 12))
        gt_valid = jnp.asarray(rng.uniform(0, 1, 12) > 0.3)
        iou = box_iou(anchors, gts)
        m1 = match(iou, gt_valid, 0.7, 0.3, allow_low_quality=lq)
        m2 = match_streamed(anchors, gts, gt_valid, 0.7, 0.3,
                            allow_low_quality=lq)
        assert np.array_equal(np.asarray(m1.labels), np.asarray(m2.labels))
        # matched_idx must agree wherever it matters (fg or ignore slots).
        care = np.asarray(m1.labels) != 0
        assert np.array_equal(np.asarray(m1.matched_idx)[care],
                              np.asarray(m2.matched_idx)[care])

    def test_no_valid_gt_all_background(self):
        rng = np.random.default_rng(0)
        anchors = jnp.asarray(random_boxes(rng, 50))
        gts = jnp.asarray(random_boxes(rng, 4))
        m = match_streamed(anchors, gts, jnp.zeros(4, bool), 0.7, 0.3,
                           allow_low_quality=True)
        assert not np.any(np.asarray(m.labels) != 0)

    def test_low_quality_promotes_best_anchor(self):
        anchors = jnp.asarray([[0, 0, 10, 10], [50, 50, 60, 60]], jnp.float32)
        # gt overlaps anchor 0 only slightly (IoU < 0.3).
        gts = jnp.asarray([[8, 8, 30, 30]], jnp.float32)
        valid = jnp.asarray([True])
        m_no = match_streamed(anchors, gts, valid, 0.7, 0.3, False)
        m_lq = match_streamed(anchors, gts, valid, 0.7, 0.3, True)
        assert np.asarray(m_no.labels)[0] == 0
        assert np.asarray(m_lq.labels)[0] == 1  # best anchor for the gt


class TestBalancedSampler:
    def test_counts_and_fraction(self):
        rng = np.random.default_rng(1)
        labels = jnp.asarray(rng.choice([-1, 0, 1], 1000,
                                        p=[0.1, 0.8, 0.1]), jnp.int32)
        valid = jnp.ones(1000, bool)
        s = balanced_sample(jax.random.key(0), labels, valid, 256, 0.5)
        total = float(s.weights.sum())
        pos = float(s.pos_weights.sum())
        assert total == 256
        assert pos <= 128
        # All sampled positives really are positives.
        assert np.all(np.asarray(labels)[np.asarray(s.pos_weights) > 0] == 1)

    def test_few_positives_filled_with_negatives(self):
        labels = jnp.asarray([1] * 3 + [0] * 500, jnp.int32)
        valid = jnp.ones(503, bool)
        s = balanced_sample(jax.random.key(1), labels, valid, 64, 0.25)
        assert float(s.pos_weights.sum()) == 3
        assert float(s.weights.sum()) == 64

    def test_gather_variant_packs_positives_first(self):
        labels = jnp.asarray([1] * 10 + [0] * 100, jnp.int32)
        valid = jnp.ones(110, bool)
        g = balanced_sample_gather(jax.random.key(2), labels, valid, 32, 0.25)
        assert g.idx.shape == (32,)
        assert bool(g.valid.all())
        is_pos = np.asarray(g.is_pos)
        assert is_pos.sum() == 8  # 25% of 32
        # Positives packed first.
        assert is_pos[: is_pos.sum()].all()
        # Every is_pos index really points at a positive label.
        assert np.all(np.asarray(labels)[np.asarray(g.idx)[is_pos]] == 1)
