"""Unit tests for the shared measurement harness (utils/benchharness.py) —
the methodology bench.py and tools/profiler.py both rely on for every
hardware number (plausibility filter, trial budget, input freshness)."""

import numpy as np
import pytest

from vtamiq_tpu.utils.benchharness import (fresh_pair_batch, timed_median,
                                           ImplausiblyFast)


class TestTimedMedian:
    def test_median_of_plausible_trials(self):
        import time as _time
        durations = iter([0.02, 0.04, 0.03])

        def fn(t):
            _time.sleep(next(durations))
            return 1.0

        # bound implies min_dt = 10/1000 = 0.01s; all three plausible ->
        # median 0.03s -> ~333 pairs/s
        rate = timed_median(fn, pairs_per_call=10, bound=1000.0, trials=3)
        assert 250 < rate < 420

    def test_rejects_implausibly_fast(self):
        # instant returns imply a rate far above the bound -> all rejected
        with pytest.raises(ImplausiblyFast):
            timed_median(lambda t: 1.0, pairs_per_call=1000, bound=10.0,
                         trials=2)

    def test_spare_attempts_allow_partial_rejection(self):
        import time as _time
        calls = []

        def fn(t):
            calls.append(t)
            if len(calls) <= 2:
                return 1.0            # replay-fast: rejected
            _time.sleep(0.02)
            return 1.0

        rate = timed_median(fn, pairs_per_call=10, bound=1000.0, trials=2)
        assert len(calls) == 4        # 2 rejected + 2 plausible (== trials+2)
        assert rate < 1000.0

    def test_trial_index_passed_through(self):
        import time as _time
        seen = []

        def fn(t):
            seen.append(t)
            _time.sleep(0.011)
            return 0.0

        timed_median(fn, pairs_per_call=10, bound=1000.0, trials=2)
        assert seen == [0, 1]         # callers vary inputs with t


class TestFreshPairBatch:
    def test_shape_dtype_and_freshness(self):
        raw1, key1 = fresh_pair_batch(2, 32, 48)
        raw2, key2 = fresh_pair_batch(2, 32, 48, seed_extra=1)
        assert raw1.shape == (2, 2, 32, 48, 3)
        assert str(raw1.dtype) == "float32"
        assert raw1.min() >= 0.0 and raw1.max() <= 1.0
        # time-based seeds: two calls must not produce identical inputs
        assert not np.array_equal(np.asarray(raw1), np.asarray(raw2))
        assert not np.array_equal(np.asarray(key1), np.asarray(key2))
