"""COCO evaluator tests: hand-computable cases + invariants."""
import numpy as np
import pytest

from podtpu.train.coco_metrics import (
    COCOEvaluator,
    STAT_NAMES,
    pairwise_iou,
)


def box(x, y, w, h):
    return [x, y, x + w, y + h]


class TestPairwiseIoU:
    def test_basic(self):
        a = np.array([box(0, 0, 10, 10)])
        b = np.array([box(0, 0, 10, 10), box(5, 0, 10, 10), box(50, 50, 5, 5)])
        iou = pairwise_iou(a, b)
        assert iou[0, 0] == pytest.approx(1.0)
        assert iou[0, 1] == pytest.approx(50 / 150)
        assert iou[0, 2] == 0.0

    def test_empty(self):
        assert pairwise_iou(np.zeros((0, 4)), np.zeros((3, 4))).shape == (0, 3)


class TestPerfectDetector:
    def test_exact_predictions_give_ap1(self):
        ev = COCOEvaluator(num_classes=2)
        rng = np.random.default_rng(0)
        for _ in range(4):
            n = 5
            gt = np.stack([
                np.asarray(box(*xy, *wh))
                for xy, wh in zip(rng.uniform(0, 200, (n, 2)),
                                  rng.uniform(40, 80, (n, 2)))])
            labels = rng.integers(1, 3, n)
            ev.update(gt, labels, gt, np.ones(n), labels)
        stats = ev.summarize()
        assert stats[0] == pytest.approx(1.0)   # AP
        assert stats[1] == pytest.approx(1.0)   # AP50
        assert stats[8] == pytest.approx(1.0)   # AR@300

    def test_no_detections_gives_ap0(self):
        ev = COCOEvaluator(num_classes=1)
        ev.update(np.array([box(0, 0, 50, 50)]), np.array([1]),
                  np.zeros((0, 4)), np.zeros(0), np.zeros(0, int))
        stats = ev.summarize()
        assert stats[0] == pytest.approx(0.0)
        assert stats[8] == pytest.approx(0.0)

    def test_no_gt_gives_minus1(self):
        ev = COCOEvaluator(num_classes=1)
        ev.update(np.zeros((0, 4)), np.zeros(0, int),
                  np.array([box(0, 0, 50, 50)]), np.array([0.9]), np.array([1]))
        stats = ev.summarize()
        assert stats[0] == -1.0


class TestPartialDetector:
    def test_half_recall(self):
        """2 gts, 1 perfect detection -> AP ~ 0.5 (precision 1 to recall .5)."""
        ev = COCOEvaluator(num_classes=1)
        g1, g2 = box(0, 0, 50, 50), box(100, 100, 50, 50)
        ev.update(np.array([g1, g2]), np.array([1, 1]),
                  np.array([g1]), np.array([0.9]), np.array([1]))
        stats = ev.summarize()
        # 101-pt interpolation: recall points 0..0.5 inclusive have P=1.
        assert stats[1] == pytest.approx(51 / 101, abs=1e-6)

    def test_false_positive_hurts_precision(self):
        ev = COCOEvaluator(num_classes=1)
        gt = box(0, 0, 50, 50)
        # One TP at score .9 plus one far FP at higher score .95.
        ev.update(np.array([gt]), np.array([1]),
                  np.array([box(300, 300, 50, 50), gt]),
                  np.array([0.95, 0.9]), np.array([1, 1]))
        stats = ev.summarize()
        # Precision at full recall is 1/2; envelope gives AP -> 0.5.
        assert stats[1] == pytest.approx(0.5, abs=1e-2)

    def test_localization_quality_thresholds(self):
        """A det with IoU ~0.6 counts at IoU<=0.6 thresholds only."""
        ev = COCOEvaluator(num_classes=1)
        gt = np.array([box(0, 0, 100, 100)])
        det = np.array([box(0, 0, 100, 75)])  # IoU = 0.75
        ev.update(gt, np.array([1]), det, np.array([0.9]), np.array([1]))
        stats = ev.summarize()
        assert stats[1] == pytest.approx(1.0)  # AP50 hit
        # AP over 0.5:0.95: matched at thr 0.5..0.75 (6 of 10).
        assert stats[0] == pytest.approx(0.6, abs=1e-6)

    def test_duplicate_detections_are_fps(self):
        ev = COCOEvaluator(num_classes=1)
        gt = np.array([box(0, 0, 50, 50)])
        det = np.vstack([gt[0], gt[0], gt[0]])
        ev.update(gt, np.array([1]), det,
                  np.array([0.9, 0.8, 0.7]), np.array([1, 1, 1]))
        stats = ev.summarize()
        assert stats[1] == pytest.approx(1.0)  # envelope: P=1 up to R=1


class TestAreaRanges:
    def test_small_object_only_counts_in_small(self):
        ev = COCOEvaluator(num_classes=1)
        gt = np.array([box(0, 0, 10, 10)])  # area 100 < 1024 -> small
        ev.update(gt, np.array([1]), gt, np.array([0.9]), np.array([1]))
        stats = ev.summarize()
        assert stats[3] == pytest.approx(1.0)   # AP small
        assert stats[4] == -1.0                  # no medium gt
        assert stats[5] == -1.0                  # no large gt


class TestMaxDets:
    def test_ar_at_1_caps_recall(self):
        ev = COCOEvaluator(num_classes=1, max_dets=(1, 10, 100))
        gts = np.array([box(0, 0, 50, 50), box(100, 100, 50, 50)])
        ev.update(gts, np.array([1, 1]), gts,
                  np.array([0.9, 0.8]), np.array([1, 1]))
        stats = ev.summarize()
        assert stats[6] == pytest.approx(0.5)  # AR@1: one det allowed
        assert stats[7] == pytest.approx(1.0)  # AR@10


class TestMergeFrom:
    def test_split_updates_equal_single_evaluator(self):
        """Updating one evaluator with all images == updating two with a
        split and merging (the multi-host DP eval merge)."""
        rng = np.random.default_rng(5)
        single = COCOEvaluator(num_classes=2)
        a = COCOEvaluator(num_classes=2)
        b = COCOEvaluator(num_classes=2)
        for i in range(6):
            n = 4
            gt = np.stack([
                np.asarray(box(*xy, *wh))
                for xy, wh in zip(rng.uniform(0, 200, (n, 2)),
                                  rng.uniform(20, 80, (n, 2)))])
            labels = rng.integers(1, 3, n)
            jitter = gt + rng.normal(0, 3, gt.shape)
            scores = rng.uniform(0.3, 1.0, n)
            single.update(gt, labels, jitter, scores, labels)
            (a if i % 2 == 0 else b).update(gt, labels, jitter, scores,
                                            labels)
        a.merge_from(b)
        assert a.summarize() == pytest.approx(single.summarize())


def test_summary_text_format():
    ev = COCOEvaluator(num_classes=1)
    gt = np.array([box(0, 0, 50, 50)])
    ev.update(gt, np.array([1]), gt, np.array([0.9]), np.array([1]))
    text = ev.summary_text()
    lines = text.splitlines()
    assert len(lines) == 12
    assert lines[0].startswith(STAT_NAMES[0])
    assert lines[0].endswith("= 1.000")


class TestPerClass:
    def test_perfect_vs_missed_class(self):
        """Class 1 detected perfectly, class 2 never detected, class 3 has
        no ground truth at all (omitted from the breakdown)."""
        ev = COCOEvaluator(num_classes=3)
        g1 = np.array([box(0, 0, 50, 50)])
        g2 = np.array([box(100, 100, 40, 40)])
        ev.update(np.concatenate([g1, g2]), np.array([1, 2]),
                  g1, np.array([0.9]), np.array([1]))
        stats = ev.per_class_stats()
        assert set(stats) == {1, 2}
        assert stats[1][0] == pytest.approx(1.0)   # AP
        assert stats[1][1] == pytest.approx(1.0)   # AP50
        assert stats[1][3] == pytest.approx(1.0)   # AR
        assert stats[2][0] == pytest.approx(0.0)
        assert stats[2][3] == pytest.approx(0.0)
        # Class-averaged AP must equal the mean of the per-class APs here
        # (both classes share the "all" area range and full maxDets).
        summary = ev.summarize()
        assert summary[0] == pytest.approx((stats[1][0] + stats[2][0]) / 2)

    def test_per_class_text(self):
        ev = COCOEvaluator(num_classes=2)
        g = np.array([box(0, 0, 50, 50)])
        ev.update(g, np.array([2]), g, np.array([0.9]), np.array([2]))
        text = ev.per_class_text(["alpha", "beta"])
        lines = text.splitlines()
        assert lines[0].split() == ["class", "AP", "AP50", "AP75", "AR"]
        assert len(lines) == 2       # only beta has ground truth
        assert lines[1].startswith("beta")
        assert "1.000" in lines[1]
