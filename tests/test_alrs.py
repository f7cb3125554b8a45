"""ALRS scheduler tests, including a scipy cross-check of the slope statistic."""
import numpy as np
import pytest
import scipy.stats as stats

from podtpu.train.alrs import (
    AdaptiveLearningRateScheduler,
    RollingBuffer,
    slope_probability_less_than,
)


def reference_slope_prob(values, prob=0.0):
    """Independent recomputation with scipy (the reference's formula)."""
    idxs = np.arange(len(values), dtype=float)
    n = float(len(values))
    if n < 3:
        return 1.0
    slope, intercept, *_ = stats.linregress(idxs, values)
    predicted = idxs * slope + intercept
    variance = np.sum((predicted - np.asarray(values)) ** 2) / (n - 2)
    std_err = np.sqrt(variance * (12.0 / (n ** 3 - n)))
    return stats.norm.cdf(prob, slope, std_err)


class TestSlopeProbability:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_scipy_formula(self, seed):
        rng = np.random.default_rng(seed)
        values = (1.0 - 0.05 * np.arange(10)
                  + rng.normal(0, 0.05, 10)).tolist()
        assert slope_probability_less_than(values) == pytest.approx(
            reference_slope_prob(values), abs=1e-9)

    def test_decreasing_series_high_prob(self):
        values = [1.0 - 0.1 * i for i in range(10)]
        assert slope_probability_less_than(values) > 0.99

    def test_flat_noisy_series_low_prob(self):
        rng = np.random.default_rng(0)
        values = (1.0 + rng.normal(0, 0.01, 10)).tolist()
        assert slope_probability_less_than(values) < 0.9

    def test_increasing_series_near_zero(self):
        values = [1.0 + 0.1 * i for i in range(10)]
        assert slope_probability_less_than(values) < 0.01

    def test_short_series_returns_one(self):
        assert slope_probability_less_than([1.0, 0.9]) == 1.0


class TestRollingBuffer:
    def test_ring_behaviour(self):
        b = RollingBuffer(3)
        for v in [1, 2, 3, 4]:
            b.append(v)
        assert b.values() == [2, 3, 4]
        assert b.full()
        b.clear()
        assert len(b) == 0 and not b.full()


class TestScheduler:
    def test_warmup_never_drops(self):
        s = AdaptiveLearningRateScheduler(0.005, nb_epochs=5,
                                          startup_delay_factor=2,
                                          verbose=False)
        for epoch in range(10):  # all within warmup (< 2*5)
            finished = s.step(epoch, 1.0)  # flat loss would otherwise drop
        assert not finished and s.drop_count == 0
        assert s.lr == 0.005

    def test_drops_on_plateau_and_finishes(self):
        s = AdaptiveLearningRateScheduler(0.005, nb_epochs=4, nb_drops=2,
                                          startup_delay_factor=1,
                                          verbose=False)
        epoch = 0
        finished = False
        # Decreasing losses first: no drop.
        for loss in [1.0, 0.9, 0.8, 0.7, 0.6, 0.5]:
            finished = s.step(epoch, loss)
            epoch += 1
        assert s.drop_count == 0
        # Plateau: buffer refills then drops, twice -> finished.
        for _ in range(20):
            finished = s.step(epoch, 0.5)
            epoch += 1
            if finished:
                break
        assert finished
        assert s.drop_count == 2
        assert s.lr == pytest.approx(0.005 * 0.25)

    def test_buffer_cleared_after_drop(self):
        s = AdaptiveLearningRateScheduler(0.01, nb_epochs=3, nb_drops=4,
                                          startup_delay_factor=0,
                                          verbose=False)
        for epoch, loss in enumerate([1.0, 1.0, 1.0]):
            s.step(epoch, loss)
        assert s.drop_count == 1
        assert len(s.buffer) == 0

    def test_state_roundtrip(self):
        s = AdaptiveLearningRateScheduler(0.005, verbose=False)
        s.step(0, 1.0)
        s.drop_count = 2
        state = s.state_dict()
        t = AdaptiveLearningRateScheduler(0.005, verbose=False)
        t.load_state_dict(state)
        assert t.drop_count == 2
        assert t.buffer.values() == s.buffer.values()
        assert t.lr == pytest.approx(0.005 * 0.25)


class TestZeroMapMonitor:
    """Round-5 failure-awareness: a run whose per-epoch eval mAP stays
    0.000 must be called out (and optionally aborted) instead of letting
    the loss-only ALRS terminate it "as if converged" — the round-4
    mobilenet_v3 hard run burned 24 epochs that way."""

    def _mon(self, **kw):
        from podtpu.train.train import ZeroMapMonitor
        return ZeroMapMonitor(**kw)

    def test_warns_after_n_zero_epochs(self, capsys):
        m = self._mon(warn_epochs=3, abort=False)
        for epoch in range(2):
            assert not m.update(epoch, 0.0, 0.0)
        assert "WARNING" not in capsys.readouterr().out
        assert not m.update(2, 0.0, 0.0)  # warns, does not abort
        out = capsys.readouterr().out
        assert "0.000 for 3 consecutive epochs" in out
        assert "abort_on_zero_map" in out

    def test_abort_after_n_zero_epochs(self):
        m = self._mon(warn_epochs=3, abort=True)
        assert not m.update(0, 0.0)
        assert not m.update(1, 0.0)
        assert m.update(2, 0.0)

    def test_nonzero_map_resets(self, capsys):
        m = self._mon(warn_epochs=2, abort=True)
        assert not m.update(0, 0.0)
        assert not m.update(1, 0.01)  # learned something: counter resets
        assert not m.update(2, 0.0)
        assert m.update(3, 0.0)

    def test_no_detections_sentinel_counts_as_zero(self):
        # COCO-style -1 ("nothing to evaluate") is total failure too.
        m = self._mon(warn_epochs=2, abort=True)
        assert not m.update(0, -1.0)
        assert m.update(1, -1.0)

    def test_train_config_has_knobs(self):
        from podtpu.core.config import TrainConfig
        cfg = TrainConfig()
        assert cfg.zero_map_warn_epochs == 5
        assert cfg.abort_on_zero_map is False
