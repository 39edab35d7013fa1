"""Statistical parity: our CAPS sampler vs the reference's numpy sampler.

The TPU redesign intentionally replaces the reference's data-dependent
allocation loop and per-cell grid placement with deterministic largest-
remainder + randomized-Halton (SURVEY.md §7 "hard parts": tolerance is on
final metrics / sampling DISTRIBUTION, not identical draws). These tests
check the distributions agree: exact per-scale budget math, matched spatial
histograms for uniform + weighted sampling, and matched uv normalization.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from reference_shim import install_reference, reference_available

from vtamiq_tpu.ops import (
    PatchSampler, GRID_TYPE_PERTURBED, compute_num_patches_per_scale,
    compute_patch_num_scales, get_iqa_patches,
)
from vtamiq_tpu.ops.sampling import sample_positions_uniform, sample_positions_weighted

HAVE_REF = reference_available() and install_reference()
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference unavailable")


class TestBudgetMathExact:
    """The per-scale budget math must match the reference exactly."""

    def test_num_patches_per_scale(self):
        import data.patch_sampling as ref_ps
        for count in (16, 256, 384, 500, 1024):
            for scales in (1, 2, 3, 5):
                if count < scales:
                    continue
                for ratio in (1.0, 1.7, 1.75, 2.0):
                    ours = compute_num_patches_per_scale(count, scales, ratio)
                    theirs = ref_ps.compute_num_patches_per_scale(count, scales, ratio)
                    np.testing.assert_array_equal(ours, theirs,
                                                  err_msg=f"{count},{scales},{ratio}")

    def test_patch_num_scales(self):
        import data.patch_sampling as ref_ps
        for h, w in ((384, 512), (64, 64), (288, 288), (1024, 768)):
            for want in (1, 2, 3, 5):
                ours = compute_patch_num_scales(want, h, w, 16)
                theirs = ref_ps.compute_patch_num_scales(want, h, w, 16, 16)
                assert ours == theirs, (h, w, want)


def spatial_histogram(samples_ij, h, w, bins=4):
    """2D histogram of sample top-left positions, normalized."""
    hist, _, _ = np.histogram2d(samples_ij[0], samples_ij[1],
                                bins=bins, range=[[0, h], [0, w]])
    return hist / hist.sum()


class TestUniformSamplingDistribution:
    def test_spatial_histogram_matches_reference(self):
        """PERTURBED_SIMPLE (shipped default): aggregate spatial density over
        many draws must match the reference's jittered grid."""
        import data.patch_sampling as ref_ps
        h, w, p, n, reps = 192, 256, 16, 128, 30

        ours = []
        key = jax.random.PRNGKey(0)
        for i in range(reps):
            key, sub = jax.random.split(key)
            ours.append(np.asarray(sample_positions_uniform(sub, h, w, p, n)))
        ours = np.concatenate(ours, axis=1)

        np.random.seed(0)
        theirs = []
        for _ in range(reps):
            s = ref_ps.stratified_grid_sampling(
                h, w, p, p, sample_prob=np.ones((h, w)), num_samples=n,
                grid_function_type=ref_ps.GRID_TYPE_PERTURBED_SIMPLE)
            theirs.append(s)
        theirs = np.concatenate(theirs, axis=1)

        h_ours = spatial_histogram(ours, h, w)
        h_theirs = spatial_histogram(theirs, h, w)
        # 4x4 coarse bins: both should be ~uniform (1/16 each)
        assert np.abs(h_ours - h_theirs).max() < 0.02, (h_ours, h_theirs)

    def test_range_matches(self):
        import data.patch_sampling as ref_ps
        h, w, p, n = 192, 256, 16, 256
        np.random.seed(1)
        theirs = ref_ps.stratified_grid_sampling(
            h, w, p, p, sample_prob=np.ones((h, w)), num_samples=n,
            grid_function_type=ref_ps.GRID_TYPE_PERTURBED_SIMPLE)
        ours = np.asarray(sample_positions_uniform(jax.random.PRNGKey(1), h, w, p, n))
        for arr in (theirs, ours):
            assert arr[0].min() >= 0 and arr[0].max() <= h - p + 1e-5
            assert arr[1].min() >= 0 and arr[1].max() <= w - p + 1e-5


class TestWeightedSamplingDistribution:
    def test_weighted_histogram_matches_reference(self):
        """Full CAPS with a strongly non-uniform probability map: per-region
        sample mass must track the reference's cell allocation."""
        import data.patch_sampling as ref_ps
        h, w, p, n, reps = 128, 128, 16, 200, 20

        prob = np.full((h, w), 0.1)
        prob[:, : w // 2] = 1.0  # left half 10x more likely
        prob /= prob.sum()

        key = jax.random.PRNGKey(2)
        ours = []
        for i in range(reps):
            key, sub = jax.random.split(key)
            ours.append(np.asarray(sample_positions_weighted(
                sub, jnp.asarray(prob, jnp.float32), h, w, p, n)))
        ours = np.concatenate(ours, axis=1)

        np.random.seed(2)
        theirs = []
        for _ in range(reps):
            theirs.append(ref_ps.stratified_grid_sampling(
                h, w, p, p, sample_prob=prob, num_samples=n,
                grid_function_type=ref_ps.GRID_TYPE_PERTURBED))
        theirs = np.concatenate(theirs, axis=1)

        frac_left_ours = np.mean(ours[1] < w / 2)
        frac_left_theirs = np.mean(theirs[1] < w / 2)
        assert abs(frac_left_ours - frac_left_theirs) < 0.06, (
            frac_left_ours, frac_left_theirs)


class TestDiffMapParity:
    def test_magnitude_diff_matches_reference(self):
        import data.patch_sampling as ref_ps
        rng = np.random.default_rng(0)
        ref_img = rng.uniform(0, 1, (32, 32, 3))
        dist_img = np.clip(ref_img + rng.normal(0, 0.2, ref_img.shape), 0, 1)

        sampler_ref = ref_ps.PatchSampler(
            diff_weight=1.0, uniform_weight=0.1,
            grid_type=ref_ps.GRID_TYPE_PERTURBED)
        # reference normalizes PIL inputs via pil2np (min-max); feed arrays
        # already in [0,1] with min 0 / max 1 so both paths see the same data
        ref_img[0, 0] = 0.0
        ref_img[-1, -1] = 1.0
        dist_img[0, 0] = 0.0
        dist_img[-1, -1] = 1.0
        theirs = sampler_ref.compute_diff([ref_img, dist_img])

        from vtamiq_tpu.ops import compute_diff_map
        imgs = jnp.stack([jnp.asarray(ref_img, jnp.float32),
                          jnp.asarray(dist_img, jnp.float32)])
        ours = np.asarray(compute_diff_map(imgs))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class TestGetIqaPatchesParity:
    def test_uv_and_scale_budgets_match_reference(self):
        """Multiscale extraction: per-scale counts and uv normalization match
        the reference's get_iqa_patches on the same synthetic inputs."""
        import torch
        import data.patch_sampling as ref_ps
        rng = np.random.default_rng(3)
        h, w, n, scales_want = 256, 256, 84, 3
        img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        img2 = np.clip(img + 0.1, 0, 1)

        sampler_t = ref_ps.PatchSampler()  # PERTURBED_SIMPLE default
        t_patches, t_pos, t_scales = ref_ps.get_iqa_patches(
            [img, img2],
            [torch.from_numpy(img.transpose(2, 0, 1)),
             torch.from_numpy(img2.transpose(2, 0, 1))],
            n, 16, sampler_t, scales_want, scale_num_samples_ratio=2.0)

        ours_patches, ours_pos, ours_scales = get_iqa_patches(
            jnp.stack([jnp.asarray(img), jnp.asarray(img2)]),
            jnp.stack([jnp.asarray(img), jnp.asarray(img2)]),
            jax.random.PRNGKey(0), n, 16, PatchSampler(), scales_want,
            scale_num_samples_ratio=2.0)

        assert ours_patches.shape == tuple(t_patches.shape[:2]) + (16, 16, 3)
        # identical per-scale counts
        t_counts = np.bincount(np.asarray(t_scales[0]), minlength=scales_want)
        o_counts = np.bincount(np.asarray(ours_scales[0]), minlength=scales_want)
        np.testing.assert_array_equal(t_counts, o_counts)
        # identical uv range conventions
        t_uv = np.asarray(t_pos)
        o_uv = np.asarray(ours_pos)
        assert t_uv.min() >= 0 and t_uv.max() < 1.0
        assert o_uv.min() >= 0 and o_uv.max() < 1.0


def ks_statistic(a, b):
    """Two-sample Kolmogorov-Smirnov statistic (max CDF gap)."""
    import scipy.stats
    return scipy.stats.ks_2samp(a, b).statistic


class TestKSParity:
    """Fine-grained distribution parity: per-axis two-sample KS statistic on
    large-N draws (VERDICT round-1: coarse 4x4 histograms could hide a
    moderate sampler shift that only shows up as SROCC drift)."""

    def test_uniform_ks_per_axis(self):
        import data.patch_sampling as ref_ps
        h, w, p, n, reps = 192, 256, 16, 128, 60

        key = jax.random.PRNGKey(11)
        ours = []
        for _ in range(reps):
            key, sub = jax.random.split(key)
            ours.append(np.asarray(sample_positions_uniform(sub, h, w, p, n)))
        ours = np.concatenate(ours, axis=1)

        np.random.seed(11)
        theirs = []
        for _ in range(reps):
            theirs.append(ref_ps.stratified_grid_sampling(
                h, w, p, p, sample_prob=np.ones((h, w)), num_samples=n,
                grid_function_type=ref_ps.GRID_TYPE_PERTURBED_SIMPLE))
        theirs = np.concatenate(theirs, axis=1)

        # 7680 draws/side: KS stat ~0.01 is sampling noise; 0.02 bound
        # detects any real shift in either marginal
        assert ks_statistic(ours[0], theirs[0]) < 0.02
        assert ks_statistic(ours[1], theirs[1]) < 0.02

    def _weighted_draws(self, grid_type_ours, grid_type_theirs, prob, h, w, p,
                        n, reps, seed):
        import data.patch_sampling as ref_ps
        key = jax.random.PRNGKey(seed)
        ours = []
        for _ in range(reps):
            key, sub = jax.random.split(key)
            ours.append(np.asarray(sample_positions_weighted(
                sub, jnp.asarray(prob, jnp.float32), h, w, p, n,
                grid_type=grid_type_ours)))
        ours = np.concatenate(ours, axis=1)

        np.random.seed(seed)
        theirs = []
        for _ in range(reps):
            theirs.append(ref_ps.stratified_grid_sampling(
                h, w, p, p, sample_prob=prob, num_samples=n,
                grid_function_type=grid_type_theirs))
        theirs = np.concatenate(theirs, axis=1)
        return ours, theirs

    def _gradient_prob(self, h, w):
        # smooth non-uniform map: linear gradient left->right + vertical bump
        x = np.linspace(0.2, 1.0, w)[None, :]
        y = 1.0 + np.exp(-0.5 * ((np.arange(h) - h / 3) / (h / 6)) ** 2)[:, None]
        prob = (x * y)
        return prob / prob.sum()

    def test_weighted_perturbed_ks_per_axis(self):
        import data.patch_sampling as ref_ps
        h, w, p, n, reps = 128, 128, 16, 200, 40
        prob = self._gradient_prob(h, w)
        ours, theirs = self._weighted_draws(
            GRID_TYPE_PERTURBED, ref_ps.GRID_TYPE_PERTURBED,
            prob, h, w, p, n, reps, seed=5)
        # 8000 draws/side; the allocation rule differs (largest-remainder vs
        # random dissolve) so allow slightly more than pure noise
        assert ks_statistic(ours[0], theirs[0]) < 0.03
        assert ks_statistic(ours[1], theirs[1]) < 0.03

    def test_weighted_halton_ks_per_axis(self):
        import data.patch_sampling as ref_ps
        from vtamiq_tpu.ops.sampling import GRID_TYPE_HALTON
        h, w, p, n, reps = 128, 128, 16, 200, 40
        prob = self._gradient_prob(h, w)
        ours, theirs = self._weighted_draws(
            GRID_TYPE_HALTON, ref_ps.GRID_TYPE_HALTON,
            prob, h, w, p, n, reps, seed=6)
        assert ks_statistic(ours[0], theirs[0]) < 0.03
        assert ks_statistic(ours[1], theirs[1]) < 0.03

    def test_weighted_fine_histogram(self):
        """8x8 spatial histogram on the two-region map, tighter bound than
        the round-1 4x4/0.02 test."""
        import data.patch_sampling as ref_ps
        h, w, p, n, reps = 128, 128, 16, 200, 40
        prob = np.full((h, w), 0.1)
        prob[:, : w // 2] = 1.0
        prob /= prob.sum()
        ours, theirs = self._weighted_draws(
            GRID_TYPE_PERTURBED, ref_ps.GRID_TYPE_PERTURBED,
            prob, h, w, p, n, reps, seed=7)
        h_ours = spatial_histogram(ours, h, w, bins=8)
        h_theirs = spatial_histogram(theirs, h, w, bins=8)
        assert np.abs(h_ours - h_theirs).max() < 0.012, (
            np.abs(h_ours - h_theirs).max())
        # region mass: tighter than the round-1 0.06 bound
        frac_ours = np.mean(ours[1] < w / 2)
        frac_theirs = np.mean(theirs[1] < w / 2)
        assert abs(frac_ours - frac_theirs) < 0.03, (frac_ours, frac_theirs)


class TestDissolveStress:
    """Stress the 12-pass expected-value dissolve approximation
    (ops/sampling.py _dissolve_alloc) against the reference's data-dependent
    while-loop (patch_sampling.py:277-294) on the pathological maps the
    round-2 VERDICT flagged: near-delta and multi-modal probability maps."""

    @staticmethod
    def _ref_dissolve(probs, num_samples, rng):
        """The reference's random-dissolve loop, verbatim semantics
        (patch_sampling.py:277-294) on a per-cell probability vector."""
        c = np.ceil(probs * num_samples).astype(int).flatten()
        n_cells = len(c)
        while c.sum() != num_samples:
            total = c.sum()
            d = total - num_samples
            pa = c / total
            pa = (pa.max() + 1e-3) - pa
            pa = pa / pa.sum()
            idx = rng.choice(n_cells, abs(d), replace=True, p=pa)
            v = 1 if d < 0 else -1
            c[idx] = np.maximum(c[idx] + v, 0)
        return c

    def _mean_counts(self, probs, num_samples, reps=200, seed=0):
        from vtamiq_tpu.ops.sampling import _dissolve_alloc
        probs_j = jnp.asarray(probs, jnp.float32)
        alloc = jax.jit(lambda k: _dissolve_alloc(k, probs_j, num_samples))
        key = jax.random.PRNGKey(seed)
        ours = np.zeros(len(probs))
        for _ in range(reps):
            key, sub = jax.random.split(key)
            c = np.asarray(alloc(sub))
            assert c.sum() == num_samples  # exact-N invariant, ALWAYS
            assert (c >= 0).all()
            ours += c
        ours /= reps
        rng = np.random.default_rng(seed)
        theirs = np.zeros(len(probs))
        for _ in range(reps):
            theirs += self._ref_dissolve(probs, num_samples, rng)
        theirs /= reps
        return ours, theirs

    def _check(self, probs, num_samples, tol_abs=0.6, tol_frac=0.05):
        probs = np.asarray(probs, float)
        probs = probs / probs.sum()
        ours, theirs = self._mean_counts(probs, num_samples)
        diff = np.abs(ours - theirs)
        bound = np.maximum(tol_abs, tol_frac * theirs)
        assert (diff <= bound).all(), (
            f"mean-count mismatch: worst {diff.max():.2f} at cell "
            f"{diff.argmax()} (ours {ours[diff.argmax()]:.2f} vs ref "
            f"{theirs[diff.argmax()]:.2f})")

    def test_near_delta(self):
        """97% of mass in one cell; ceil overshoots by ~25%."""
        probs = np.full(64, 0.0005)
        probs[17] = 0.97
        self._check(probs, 200)

    def test_true_delta(self):
        probs = np.zeros(64)
        probs[3] = 1.0
        self._check(probs, 200)

    def test_multi_modal(self):
        """Three sharp far-apart peaks over a low floor."""
        probs = np.full(100, 0.001)
        probs[[7, 44, 91]] = 0.3
        self._check(probs, 256)

    def test_heavy_overshoot_many_cells(self):
        """Many tiny cells: ceil gives every cell 1 -> massive overshoot
        (the regime where fixed passes could fail to converge before the
        rescale fallback)."""
        probs = np.full(400, 1.0)
        self._check(probs, 128, tol_abs=0.25)

    def test_end_to_end_near_delta_positions(self):
        """Full weighted sampling on a near-delta diff map vs the reference:
        per-axis KS on the drawn positions."""
        import data.patch_sampling as ref_ps
        h, w, p, n, reps = 128, 128, 16, 200, 40
        yy, xx = np.mgrid[0:h, 0:w]
        prob = np.exp(-(((yy - 40) ** 2 + (xx - 88) ** 2) / (2 * 4.0 ** 2)))
        prob = prob + 1e-5
        prob /= prob.sum()
        ours, theirs = TestKSParity()._weighted_draws(
            GRID_TYPE_PERTURBED, ref_ps.GRID_TYPE_PERTURBED,
            prob, h, w, p, n, reps, seed=13)
        assert ks_statistic(ours[0], theirs[0]) < 0.04
        assert ks_statistic(ours[1], theirs[1]) < 0.04
