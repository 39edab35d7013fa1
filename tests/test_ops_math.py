"""Unit tests for the pure-math core: values, fitting, correlations, losses."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.stats

from vtamiq_tpu.ops import (
    normalize_values, reverse_values, process_qs, normalize_array,
    FitFunction, fit_values,
    compute_correlations, compute_correlations_flat, average_over_repeats,
    mae_loss, mse_loss, pears_loss, rank_loss, loss_func_iqa, loss_func_pairwise,
    SROCC_FIELD, KROCC_FIELD, PLCC_FIELD, RMSE_FIELD,
)


class TestValues:
    def test_normalize_minmax(self):
        v = normalize_values(np.array([2.0, 4.0, 6.0]))
        np.testing.assert_allclose(v, [0.0, 0.5, 1.0])

    def test_normalize_mean_std(self):
        v = normalize_values(np.array([1.0, 2.0, 3.0]), normalize=False,
                             normalize_mean_std=True)
        assert abs(v.mean()) < 1e-12 and abs(v.std() - 1.0) < 1e-12

    def test_reverse(self):
        v = reverse_values(np.array([0.0, 0.25, 1.0]))
        np.testing.assert_allclose(v, [1.0, 0.75, 0.0])

    def test_process_qs_monotone_decreasing_when_reversed(self):
        # higher raw MOS -> lower processed q (reference convention: 0 = perfect)
        qs = np.linspace(1.0, 9.0, 100) ** 2
        out = process_qs(qs, qs_normalize=True, qs_reverse=True, qs_linearize=True)
        assert out.shape == qs.shape
        # monotone non-increasing w.r.t. raw score ordering
        assert np.all(np.diff(out) <= 1e-6)
        assert 0.0 <= out.min() and out.max() <= 1.0 + 1e-6

    def test_process_qs_mutually_exclusive(self):
        with pytest.raises(ValueError):
            process_qs(np.arange(10.0), qs_linearize=True, qs_normalize_mean_std=True)

    def test_normalize_array_range(self):
        a = normalize_array(np.array([3.0, 5.0, 7.0]))
        np.testing.assert_allclose(a, [0.0, 0.5, 1.0])


class TestFitFunction:
    def test_recovers_monotone_map(self, rng):
        x = np.sort(rng.uniform(0, 1, 200))
        y = 1.0 / (1.0 + np.exp(-8.0 * (x - 0.5)))
        fit = FitFunction(x, y)
        err = np.abs(fit(x) - y).max()
        assert err < 0.05

    def test_fit_values_fallback(self):
        # degenerate constant target can fail the fit; must not raise
        src = np.arange(10.0)
        out, _fit = fit_values(src, src * 2.0 + 1.0)
        assert out.shape == src.shape


class TestCorrelations:
    def test_perfect_monotone(self, rng):
        a = rng.uniform(0, 1, 50)
        b = a ** 3  # monotone transform
        cors = compute_correlations(a, b)
        assert cors[SROCC_FIELD] > 0.999
        assert cors[KROCC_FIELD] > 0.999
        assert cors[PLCC_FIELD] > 0.98  # after logistic fit
        assert cors[RMSE_FIELD] < 0.05

    def test_matches_scipy_rank_stats(self, rng):
        a = rng.normal(size=80)
        b = a + rng.normal(scale=0.5, size=80)
        cors = compute_correlations(a, b)
        aa, bb = normalize_array(a), normalize_array(b)
        assert abs(cors[SROCC_FIELD] - scipy.stats.spearmanr(aa, bb).correlation) < 1e-12
        assert abs(cors[KROCC_FIELD] - scipy.stats.kendalltau(aa, bb).correlation) < 1e-12

    def test_average_over_repeats(self):
        x = np.array([1.0, 2.0, 3.0, 5.0, 6.0, 7.0])  # 2 repeats of 3 items
        np.testing.assert_allclose(average_over_repeats(x, 2), [3.0, 4.0, 5.0])

    def test_flat_with_repeats(self, rng):
        y = rng.uniform(0, 1, 20)
        cors = compute_correlations_flat([y, y], [y + 0.01, y - 0.01], num_repeats=2)
        assert cors[SROCC_FIELD] > 0.999


class TestLosses:
    def test_mae_mse(self):
        d = jnp.array([1.0, 2.0]); y = jnp.array([0.0, 4.0])
        assert abs(float(mae_loss(d, y)) - 1.5) < 1e-6
        assert abs(float(mse_loss(d, y)) - 2.5) < 1e-6

    def test_pears_loss_perfect(self):
        x = jnp.linspace(0, 1, 16)
        assert float(pears_loss(x, 2 * x + 1)) < 1e-5

    def test_pears_loss_anticorrelated_clamped(self):
        x = jnp.linspace(0, 1, 16)
        # negative correlation clamps to 0 -> loss = 1
        assert abs(float(pears_loss(x, -x)) - 1.0) < 1e-5

    def test_rank_loss_matches_reference_loop(self, rng):
        """Vectorized rank loss == the reference's O(B^2) pair loop."""
        d = rng.normal(size=9)
        y = rng.uniform(0, 1, 9)

        # reference semantics (train.py:357-376), reimplemented in numpy
        eps = 1e-6
        dp = np.abs(d)
        total, cnt = 0.0, 0
        for i in range(9):
            for j in range(i + 1, 9):
                rl = max(0.0, -(y[i] - y[j]) * (d[i] - d[j]) / (abs(y[i] - y[j]) + eps))
                total += rl / max(dp[i], dp[j])
                cnt += 1
        expected = total / cnt

        got = float(rank_loss(jnp.asarray(d), jnp.asarray(y)))
        assert abs(got - expected) < 1e-5

    def test_rank_loss_small_batch_zero(self):
        assert float(rank_loss(jnp.array([1.0]), jnp.array([1.0]))) == 0.0

    def test_rank_loss_perfectly_ordered(self):
        d = jnp.array([0.1, 0.2, 0.3, 0.4])
        assert float(rank_loss(d, d)) == 0.0

    def test_loss_func_iqa_default_ignores_weights(self, rng):
        d = jnp.asarray(rng.normal(size=8))
        y = jnp.asarray(rng.uniform(0, 1, 8))
        total, aux = loss_func_iqa(d, y, w_mae_loss=100.0, w_rank_loss=100.0, w_pears_loss=100.0)
        # reference behavior: optimized = rank + pears regardless of weights
        assert abs(float(total) - float(aux["rank"] + aux["pears"])) < 1e-6

    def test_loss_func_iqa_weighted(self, rng):
        d = jnp.asarray(rng.normal(size=8))
        y = jnp.asarray(rng.uniform(0, 1, 8))
        total, aux = loss_func_iqa(d, y, w_mae_loss=0.75, w_rank_loss=1.0,
                                   w_pears_loss=0.2, weighted=True)
        expect = 0.75 * aux["mae"] + 1.0 * aux["rank"] + 0.2 * aux["pears"]
        assert abs(float(total) - float(expect)) < 1e-6

    def test_losses_jittable_and_grad(self):
        d = jnp.linspace(-1, 1, 8)
        y = jnp.linspace(0, 1, 8)
        fn = jax.jit(lambda d, y: loss_func_iqa(d, y)[0])
        g = jax.grad(fn)(d, y)
        assert g.shape == d.shape
        assert np.isfinite(np.asarray(g)).all()

    def test_pairwise_loss(self):
        assert abs(float(loss_func_pairwise(jnp.array([0.5]), jnp.array([1.0]))) - 0.5) < 1e-6


class TestMaskedLosses:
    """Padded batches (host pipeline repeats the last item) must produce the
    same losses and gradients as the unpadded batch — the reference never
    pads, so masked math on a padded batch IS reference parity."""

    def _pad(self, d, y, pad=3):
        dp = jnp.concatenate([d, jnp.repeat(d[-1:], pad)])
        yp = jnp.concatenate([y, jnp.repeat(y[-1:], pad)])
        return dp, yp

    def test_masked_equal_unpadded(self, rng=None):
        rng = np.random.default_rng(7)
        d = jnp.asarray(rng.normal(size=5).astype(np.float32))
        y = jnp.asarray(rng.uniform(size=5).astype(np.float32))
        dp, yp = self._pad(d, y)
        v = jnp.asarray(5)
        assert abs(float(mae_loss(d, y)) - float(mae_loss(dp, yp, v))) < 1e-6
        assert abs(float(mse_loss(d, y)) - float(mse_loss(dp, yp, v))) < 1e-6
        assert abs(float(pears_loss(d, y)) - float(pears_loss(dp, yp, v))) < 1e-5
        assert abs(float(rank_loss(d, y)) - float(rank_loss(dp, yp, v))) < 1e-5
        t0, _ = loss_func_iqa(d, y)
        t1, _ = loss_func_iqa(dp, yp, valid=v)
        assert abs(float(t0) - float(t1)) < 1e-5

    def test_masked_gradients_match_unpadded(self):
        """d-gradients of the masked padded loss equal the unpadded gradients
        on the real items and are exactly zero on the pad items."""
        rng = np.random.default_rng(3)
        d = jnp.asarray(rng.normal(size=6).astype(np.float32))
        y = jnp.asarray(rng.uniform(size=6).astype(np.float32))
        dp, yp = self._pad(d, y, pad=2)

        g_ref = jax.grad(lambda dd: loss_func_iqa(dd, y)[0])(d)
        g_pad = jax.grad(lambda dd: loss_func_iqa(dd, yp, valid=jnp.asarray(6))[0])(dp)
        np.testing.assert_allclose(np.asarray(g_pad[:6]), np.asarray(g_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(g_pad[6:]), 0.0)

    def test_rank_loss_no_nan_at_zero_predictions(self):
        """Predictions exactly 0.0 must not produce NaN (the (B,B) matrix
        form divides by max(|d_i|,|d_j|) = 0 on such pairs; the guard keeps
        the reference's loop semantics, which never hits 0/0 off-diagonal
        unless both predictions are zero)."""
        d = jnp.array([0.0, 0.0, 1.0])
        y = jnp.array([0.1, 0.9, 0.5])
        val = float(rank_loss(d, y))
        assert np.isfinite(val)
        g = jax.grad(lambda dd: rank_loss(dd, y))(d)
        assert np.isfinite(np.asarray(g)).all()

    def test_pears_loss_no_nan_grad_at_constant_predictions(self):
        """A batch whose (valid) predictions are all equal zeroes the centered
        vector; ``norm(x) + eps`` only guards the forward — sqrt's backward at
        0 is NaN and would poison params through the optimizer moments
        (observed: config-4 sweep run collapsed at a valid=1 batch). The
        smooth-norm form must give finite (zero) gradients there."""
        y = jnp.array([0.1, 0.9, 0.5, 0.3])
        for d in (jnp.zeros(4), jnp.full((4,), 12.8591)):
            val = float(pears_loss(d, y))
            assert np.isfinite(val)
            g = jax.grad(lambda dd: pears_loss(dd, y))(d)
            assert np.isfinite(np.asarray(g)).all()
        # valid=1: a single valid item is constant by definition
        d = jnp.array([12.8591, 7.0, -3.0])
        g = jax.grad(lambda dd: pears_loss(dd, y[:3], valid=jnp.asarray(1)))(d)
        assert np.isfinite(np.asarray(g)).all()
        # and the full IQA combo must stay finite end-to-end
        total, _ = loss_func_iqa(jnp.full((4,), 2.0), y)
        gt = jax.grad(lambda dd: loss_func_iqa(dd, y)[0])(jnp.full((4,), 2.0))
        assert np.isfinite(float(total)) and np.isfinite(np.asarray(gt)).all()

    def test_pairwise_masked(self):
        p = jnp.array([0.5, 0.7, 0.7])
        t = jnp.array([1.0, 0.2, 0.2])
        full = float(loss_func_pairwise(p[:2], t[:2]))
        masked = float(loss_func_pairwise(p, t, valid=jnp.asarray(2)))
        assert abs(full - masked) < 1e-6
