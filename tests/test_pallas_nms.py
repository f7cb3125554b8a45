"""Pallas NMS kernel vs the XLA fixpoint / python oracle (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.ops.nms import nms_keep
from podtpu.ops.pallas.nms_kernel import nms_fixpoint_pallas
from tests.test_ops_boxes import nms_oracle, random_boxes


class TestPallasNMS:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
    def test_matches_oracle(self, seed, thresh):
        rng = np.random.default_rng(seed)
        n = 128
        boxes = random_boxes(rng, n, size=60.0)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        sboxes = jnp.asarray(boxes[order])
        keep_sorted = np.asarray(nms_fixpoint_pallas(
            sboxes, jnp.ones(n, bool), thresh))
        keep = np.zeros(n, bool)
        keep[order] = keep_sorted
        want = nms_oracle(boxes, scores, thresh)
        assert np.array_equal(keep, want)

    def test_validity_padding(self):
        rng = np.random.default_rng(5)
        n, real = 256, 100
        boxes = random_boxes(rng, n, size=50.0)
        scores = -np.arange(n, dtype=np.float32)  # already sorted
        valid = np.arange(n) < real
        keep = np.asarray(nms_fixpoint_pallas(
            jnp.asarray(boxes), jnp.asarray(valid), 0.5))
        assert not keep[real:].any()
        want = nms_oracle(boxes, scores, 0.5, valid)
        assert np.array_equal(keep, want)

    def test_adversarial_chain(self):
        """A long suppression chain (box i overlaps i+1 heavily, i+2
        barely): the greedy result alternates keep/drop.  This is the shape
        that made the round-1 whole-matrix fixpoint iterate O(N) times; the
        blockwise kernel must stay exact on it."""
        n = 512
        # Boxes sliding right by 4px each, 10px wide: IoU(i, i+1) = 6/14
        # > 0.3, IoU(i, i+2) = 2/18 < 0.3 -> with thr 0.3 greedy keeps
        # every other box.
        x = 4.0 * np.arange(n, dtype=np.float32)
        boxes = np.stack([x, np.zeros(n, np.float32),
                          x + 10, np.full(n, 10, np.float32)], axis=1)
        scores = -np.arange(n, dtype=np.float32)  # sorted order = index
        keep = np.asarray(nms_fixpoint_pallas(
            jnp.asarray(boxes), jnp.ones(n, bool), 0.3))
        want = nms_oracle(boxes, scores, 0.3)
        assert np.array_equal(keep, want)
        assert keep[0] and not keep[1] and keep[2]  # alternating pattern

    def test_identical_boxes_cluster(self):
        """All boxes identical: greedy keeps exactly the first."""
        n = 256
        boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (n, 1))
        keep = np.asarray(nms_fixpoint_pallas(
            jnp.asarray(boxes), jnp.ones(n, bool), 0.5))
        assert keep[0] and not keep[1:].any()

    def test_cross_tile_chain(self):
        """Chains that straddle the 128-box tile boundary resolve exactly
        (the propagate matvec feeds tile t+1 the kept rows of tile t)."""
        rng = np.random.default_rng(11)
        n = 384
        # Dense cluster: every box overlaps many neighbours across tiles.
        cx = rng.uniform(40, 60, n).astype(np.float32)
        cy = rng.uniform(40, 60, n).astype(np.float32)
        w = rng.uniform(20, 40, n).astype(np.float32)
        boxes = np.stack([cx - w / 2, cy - w / 2, cx + w / 2, cy + w / 2], 1)
        scores = -np.arange(n, dtype=np.float32)
        keep = np.asarray(nms_fixpoint_pallas(
            jnp.asarray(boxes), jnp.ones(n, bool), 0.5))
        want = nms_oracle(boxes, scores, 0.5)
        assert np.array_equal(keep, want)

    def test_nms_keep_dispatch_consistency(self):
        """nms_keep gives identical results whether or not the kernel path
        triggers (on CPU both run the interpret/XLA fixpoint)."""
        rng = np.random.default_rng(7)
        n = 300  # >= 256 -> kernel path on TPU; XLA on CPU
        boxes = jnp.asarray(random_boxes(rng, n, size=80.0))
        scores = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
        keep = np.asarray(nms_keep(boxes, scores, 0.5))
        want = nms_oracle(np.asarray(boxes), np.asarray(scores), 0.5)
        assert np.array_equal(keep, want)
