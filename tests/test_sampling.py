"""Tests for CAPS sampling + patch extraction (SURVEY.md §4 plan: property
tests for cell allocation, uv ranges, scale budgets)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtamiq_tpu.ops import (
    PatchSampler, GRID_TYPE_PERTURBED, GRID_TYPE_PERTURBED_SIMPLE,
    DIFF_TYPE_MAGNITUDE, DIFF_TYPE_DARK,
    compute_patch_num_scales, compute_num_patches_per_scale,
    compute_diff_map, halton_2d, get_iqa_patches, gather_patches, avgpool2x,
)
from vtamiq_tpu.ops.sampling import (
    _largest_remainder_alloc, sample_positions_uniform, sample_positions_weighted,
    gaussian_centerbias_logdensity, centerbias_prob,
)


class TestBudgets:
    def test_single_scale(self):
        assert compute_patch_num_scales(1, 384, 512, 16) == 1

    def test_scale_cap_small_image(self):
        # tiny image cannot support 5 scales
        s = compute_patch_num_scales(5, 64, 64, 16)
        assert 1 <= s < 5

    def test_scale_cap_large_image(self):
        assert compute_patch_num_scales(3, 1024, 1024, 16) == 3

    def test_num_patches_exact_total(self):
        for count in (16, 384, 500, 501, 1024):
            for scales in (1, 2, 3, 5):
                if count < scales:
                    continue
                n = compute_num_patches_per_scale(count, scales, 1.75)
                assert n.sum() == count, (count, scales, n)
                assert (n >= 0).all()

    def test_ratio2_doubles_16_4_1(self):
        # README's idealized 16:4:1 pixel budget corresponds to ratio 2.0
        n = compute_num_patches_per_scale(21, 3, 2.0)
        assert n.sum() == 21
        assert n[0] <= n[1] <= n[2]


class TestHalton:
    def test_range_and_uniqueness(self):
        pts = np.asarray(halton_2d(jnp.arange(64)))
        assert pts.shape == (2, 64)
        assert (0.0 <= pts).all() and (pts < 1.0).all()
        # base-2 radical inverse of 0..63 are all distinct
        assert len(np.unique(pts[0])) == 64

    def test_known_values(self):
        pts = np.asarray(halton_2d(jnp.array([1, 2, 3])))
        np.testing.assert_allclose(pts[0], [0.5, 0.25, 0.75], atol=1e-6)
        np.testing.assert_allclose(pts[1], [1 / 3, 2 / 3, 1 / 9], atol=1e-6)


class TestAllocation:
    def test_exact_total(self, rng):
        p = rng.uniform(0.0, 1.0, 37)
        p /= p.sum()
        counts = np.asarray(_largest_remainder_alloc(jnp.asarray(p), 500))
        assert counts.sum() == 500
        assert (counts >= 0).all()

    def test_proportionality(self):
        p = jnp.array([0.5, 0.3, 0.2])
        counts = np.asarray(_largest_remainder_alloc(p, 100))
        np.testing.assert_array_equal(counts, [50, 30, 20])

    def test_uniform_probs(self):
        p = jnp.full((16,), 1.0 / 16.0)
        counts = np.asarray(_largest_remainder_alloc(p, 100))
        assert counts.sum() == 100
        assert counts.max() - counts.min() <= 1


class TestPositionSampling:
    def test_uniform_positions_in_bounds(self):
        key = jax.random.PRNGKey(0)
        h, w, p, n = 384, 512, 16, 500
        pos = np.asarray(sample_positions_uniform(key, h, w, p, n))
        assert pos.shape == (2, n)
        assert (0.0 <= pos[0]).all() and (pos[0] <= h - p).all()
        assert (0.0 <= pos[1]).all() and (pos[1] <= w - p).all()

    def test_uniform_positions_cover_image(self):
        # stratified grid should spread samples across all four quadrants
        key = jax.random.PRNGKey(1)
        h, w, p, n = 256, 256, 16, 256
        pos = np.asarray(sample_positions_uniform(key, h, w, p, n))
        for qi in (0, 1):
            for qj in (0, 1):
                in_q = ((pos[0] >= qi * h / 2 - p) & (pos[0] < (qi + 1) * h / 2) &
                        (pos[1] >= qj * w / 2 - p) & (pos[1] < (qj + 1) * w / 2))
                assert in_q.sum() > n / 16, (qi, qj, in_q.sum())

    def test_weighted_positions_follow_prob(self):
        key = jax.random.PRNGKey(2)
        h, w, p, n = 256, 256, 16, 512
        prob = jnp.zeros((h, w)).at[:, : w // 2].set(1.0)
        prob = prob / jnp.sum(prob)
        pos = np.asarray(sample_positions_weighted(key, prob, h, w, p, n))
        frac_left = np.mean(pos[1] < w / 2)
        assert frac_left > 0.8, frac_left

    def test_weighted_positions_in_bounds(self):
        key = jax.random.PRNGKey(3)
        h, w, p, n = 384, 512, 16, 300
        prob = jnp.full((h, w), 1.0 / (h * w))
        pos = np.asarray(sample_positions_weighted(key, prob, h, w, p, n))
        assert pos.shape == (2, n)
        assert (0.0 <= pos[0]).all() and (pos[0] <= h - p).all()
        assert (0.0 <= pos[1]).all() and (pos[1] <= w - p).all()


class TestDiffAndCenterbias:
    def test_diff_magnitude(self):
        ref = jnp.zeros((1, 8, 8, 3)).at[0, :4].set(1.0)
        dist = jnp.zeros((1, 8, 8, 3))
        imgs = jnp.concatenate([ref, dist], axis=0)
        diff = np.asarray(compute_diff_map(imgs, DIFF_TYPE_MAGNITUDE))
        assert diff.shape == (8, 8)
        assert (diff[:4] > 0).all() and (diff[4:] == 0).all()

    def test_diff_dark(self):
        img = jnp.zeros((1, 8, 8, 3)).at[0, :4].set(1.0)
        diff = np.asarray(compute_diff_map(img, DIFF_TYPE_DARK))
        # dark regions get the highest weight
        assert diff[4:].mean() > diff[:4].mean()

    def test_centerbias_peaks_at_center(self):
        cb = np.asarray(centerbias_prob(
            jnp.asarray(gaussian_centerbias_logdensity(128)), 64, 96))
        assert abs(cb.sum() - 1.0) < 1e-5
        assert cb[32, 48] > cb[0, 0]

    def test_centerbias_template_loads_from_real_file(self, tmp_path, monkeypatch):
        """Real .npy template file (the reference's centerbias.npy format,
        patch_sampling.py:47,79-80) flows through the loader into the
        sampler and changes the probability map vs the analytic fallback."""
        from vtamiq_tpu.ops.sampling import load_centerbias_template

        # an off-center log-density, clearly distinct from the analytic prior
        tpl = gaussian_centerbias_logdensity(256).astype(np.float32)
        tpl = np.roll(tpl, 64, axis=1)
        path = tmp_path / "centerbias.npy"
        np.save(path, tpl)

        # explicit-path load
        loaded = load_centerbias_template(str(path))
        np.testing.assert_array_equal(loaded, tpl)

        # env-var resolution feeds PatchSampler's default ctor path
        monkeypatch.setenv("VTAMIQ_CENTERBIAS_PATH", str(path))
        s = PatchSampler(centerbias_weight=1.0, uniform_weight=0.0,
                         grid_type=GRID_TYPE_PERTURBED)
        np.testing.assert_array_equal(s.centerbias_template, tpl)
        prob = np.asarray(s.sample_prob(64, 96, None))
        assert abs(prob.sum() - 1.0) < 1e-4
        # the rolled template's mass peaks right of center
        assert prob[:, 48:].sum() > prob[:, :48].sum()

    def test_centerbias_template_missing_falls_back_analytic(self, monkeypatch):
        monkeypatch.delenv("VTAMIQ_CENTERBIAS_PATH", raising=False)
        s = PatchSampler(centerbias_weight=1.0, uniform_weight=0.0,
                         grid_type=GRID_TYPE_PERTURBED)
        np.testing.assert_allclose(
            s.centerbias_template, gaussian_centerbias_logdensity())

    def test_centerbias_template_bad_rank_raises(self, tmp_path):
        from vtamiq_tpu.ops.sampling import load_centerbias_template
        path = tmp_path / "bad.npy"
        np.save(path, np.zeros((4, 4, 3), np.float32))
        with pytest.raises(ValueError):
            load_centerbias_template(str(path))


class TestSamplerConfig:
    def test_perturbed_simple_forces_uniform(self):
        s = PatchSampler(centerbias_weight=1.0, diff_weight=1.0, uniform_weight=0.1,
                         grid_type=GRID_TYPE_PERTURBED_SIMPLE)
        assert s.centerbias_weight == 0.0 and s.diff_weight == 0.0
        assert s.is_uniform

    def test_zero_weight_raises(self):
        with pytest.raises(ValueError):
            PatchSampler(uniform_weight=0.0)

    def test_diff_required(self):
        s = PatchSampler(diff_weight=1.0, uniform_weight=0.1,
                         grid_type=GRID_TYPE_PERTURBED)
        with pytest.raises(ValueError):
            s.sample_prob(32, 32, None)


class TestGatherExtraction:
    def test_gather_exact_blocks(self):
        h, w, p = 32, 48, 4
        img = jnp.arange(h * w * 3, dtype=jnp.float32).reshape(h, w, 3)
        topleft = jnp.array([[0.0, 10.0], [0.0, 20.0]])  # two patches
        out = np.asarray(gather_patches(img, topleft, p))
        np.testing.assert_array_equal(out[0], np.asarray(img[:p, :p]))
        np.testing.assert_array_equal(out[1], np.asarray(img[10:14, 20:24]))

    def test_gather_clamps(self):
        img = jnp.ones((16, 16, 3))
        out = gather_patches(img, jnp.array([[100.0], [100.0]]), 4)
        assert out.shape == (1, 4, 4, 3)

    def test_avgpool2x(self):
        img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        out = np.asarray(avgpool2x(img))
        np.testing.assert_allclose(out[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)
        assert out.shape == (1, 2, 2, 1)

    def test_get_iqa_patches_single_scale(self):
        key = jax.random.PRNGKey(0)
        imgs = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 96, 128, 3)), jnp.float32)
        sampler = PatchSampler()
        patches, pos, scales = get_iqa_patches(
            imgs, imgs * 2 - 1, key, patch_count=64, patch_dim=16,
            patch_sampler=sampler, patch_num_scales=1)
        assert patches.shape == (2, 64, 16, 16, 3)
        assert pos.shape == (2, 64, 2)
        assert scales is None
        pos = np.asarray(pos)
        assert (0.0 <= pos).all() and (pos < 1.0).all()
        # aligned patches: ref and dist share positions
        np.testing.assert_allclose(pos[0], pos[1])

    def test_get_iqa_patches_multiscale(self):
        key = jax.random.PRNGKey(1)
        imgs = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 256, 256, 3)), jnp.float32)
        sampler = PatchSampler()
        patches, pos, scales = get_iqa_patches(
            imgs, imgs, key, patch_count=84, patch_dim=16,
            patch_sampler=sampler, patch_num_scales=3,
            scale_num_samples_ratio=2.0)
        assert patches.shape == (2, 84, 16, 16, 3)
        assert scales is not None and scales.shape == (2, 84)
        s = np.asarray(scales[0])
        # counts follow the 16:4:1-style budget, coarse scale first
        n = compute_num_patches_per_scale(84, 3, 2.0)
        for scale_idx in range(3):
            assert (s == scale_idx).sum() == n[-scale_idx - 1]

    def test_get_iqa_patches_unaligned(self):
        key = jax.random.PRNGKey(2)
        imgs = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (2, 96, 96, 3)), jnp.float32)
        patches, pos, _ = get_iqa_patches(
            imgs, imgs, key, patch_count=32, patch_dim=16,
            patch_sampler=PatchSampler(), patch_num_scales=1,
            use_aligned_patches=False)
        assert not np.allclose(np.asarray(pos[0]), np.asarray(pos[1]))

    def test_get_iqa_patches_jit(self):
        sampler = PatchSampler()

        def fn(imgs, key):
            return get_iqa_patches(imgs, imgs, key, 32, 16, sampler, 1)

        jfn = jax.jit(fn)
        imgs = jnp.ones((2, 64, 64, 3))
        p1, _, _ = jfn(imgs, jax.random.PRNGKey(0))
        p2, _, _ = jfn(imgs, jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2))


class TestSamplerEdgeCases:
    def test_weighted_all_mass_one_pixel(self):
        """Degenerate probability map: all mass on one pixel must not crash
        and must concentrate samples near it."""
        key = jax.random.PRNGKey(0)
        h, w, p, n = 64, 64, 16, 32
        prob = jnp.zeros((h, w)).at[10, 50].set(1.0)
        pos = np.asarray(sample_positions_weighted(key, prob, h, w, p, n))
        assert pos.shape == (2, n)
        assert (0 <= pos).all() and (pos[0] <= h - p).all() and (pos[1] <= w - p).all()
        # the cell containing (10, 50) holds the entire budget
        assert np.abs(pos[1].mean() - 50) < w / 2

    def test_tiny_image_single_patch(self):
        key = jax.random.PRNGKey(1)
        pos = np.asarray(sample_positions_uniform(key, 17, 17, 16, 1))
        assert pos.shape == (2, 1)
        assert 0 <= pos[0, 0] <= 1 and 0 <= pos[1, 0] <= 1

    def test_patch_count_equals_one_per_cell(self):
        key = jax.random.PRNGKey(2)
        h, w, p = 128, 128, 16
        prob = jnp.full((h, w), 1.0 / (h * w))
        pos = np.asarray(sample_positions_weighted(key, prob, h, w, p, 7))
        assert pos.shape == (2, 7)

    def test_extraction_patch_count_equal_image_capacity(self):
        """patch_count equal to number of grid cells still yields exact N."""
        key = jax.random.PRNGKey(3)
        imgs = jnp.ones((2, 48, 48, 3))
        patches, pos, _ = get_iqa_patches(imgs, imgs, key, 4, 16, PatchSampler(), 1)
        assert patches.shape == (2, 4, 16, 16, 3)


class TestNewDiffMaps:
    """MSE + SSIM diff maps (README-advertised but unimplemented in the
    reference, README.md:77; BASELINE.json config #2 names the SSIM map)."""

    def _imgs(self, seed=0, h=48, w=64):
        rng = np.random.default_rng(seed)
        ref = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
        dist = np.clip(ref + rng.normal(0, 0.15, ref.shape), 0, 1).astype(np.float32)
        return ref, dist

    def test_mse_map(self):
        from vtamiq_tpu.ops.sampling import compute_diff_map, DIFF_TYPE_MSE
        ref, dist = self._imgs()
        out = np.asarray(compute_diff_map(
            jnp.stack([jnp.asarray(ref), jnp.asarray(dist)]), DIFF_TYPE_MSE))
        expect = ((ref - dist) ** 2).sum(axis=-1)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)
        assert out.shape == (48, 64)

    def test_ssim_matches_independent_numpy(self):
        """Uniform-window SSIM vs an independent numpy implementation with
        skimage's defaults (win=7, k1=0.01, k2=0.03, unbiased covariance)."""
        from vtamiq_tpu.ops.sampling import ssim_map
        ref, dist = self._imgs(1)
        got = np.asarray(ssim_map(jnp.asarray(ref), jnp.asarray(dist)))

        def np_local_mean(x, win=7):
            from scipy.ndimage import uniform_filter
            # uniform_filter uses reflect; emulate our SAME+renormalize edges
            pad = win // 2
            s = np.zeros_like(x)
            cnt = np.zeros(x.shape[:2])
            padded = np.pad(x, [(pad, pad), (pad, pad)] + [(0, 0)] * (x.ndim - 2))
            ones = np.pad(np.ones(x.shape[:2]), pad)
            from numpy.lib.stride_tricks import sliding_window_view
            sw = sliding_window_view(padded, (win, win), axis=(0, 1))
            s = sw.sum(axis=(-2, -1))
            cw = sliding_window_view(ones, (win, win))
            cnt = cw.sum(axis=(-2, -1))
            return s / (cnt[..., None] if x.ndim == 3 else cnt)

        n = 49
        cov_norm = n / (n - 1)
        mu_r, mu_d = np_local_mean(ref), np_local_mean(dist)
        var_r = cov_norm * (np_local_mean(ref * ref) - mu_r ** 2)
        var_d = cov_norm * (np_local_mean(dist * dist) - mu_d ** 2)
        cov = cov_norm * (np_local_mean(ref * dist) - mu_r * mu_d)
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        s = ((2 * mu_r * mu_d + c1) * (2 * cov + c2) /
             ((mu_r ** 2 + mu_d ** 2 + c1) * (var_r + var_d + c2)))
        expect = s.mean(axis=-1)
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)

    def test_ssim_identical_images_is_one(self):
        from vtamiq_tpu.ops.sampling import ssim_map
        ref, _ = self._imgs(2)
        s = np.asarray(ssim_map(jnp.asarray(ref), jnp.asarray(ref)))
        np.testing.assert_allclose(s, 1.0, atol=1e-5)

    def test_ssim_diff_map_highlights_distortion(self):
        """Local distortion must produce larger SSIM-diff values in the
        distorted region than in the clean region."""
        from vtamiq_tpu.ops.sampling import compute_diff_map, DIFF_TYPE_SSIM
        rng = np.random.default_rng(3)
        ref = rng.uniform(0.2, 0.8, (64, 64, 3)).astype(np.float32)
        dist = ref.copy()
        dist[:32] = np.clip(dist[:32] + rng.normal(0, 0.3, dist[:32].shape), 0, 1)
        out = np.asarray(compute_diff_map(
            jnp.stack([jnp.asarray(ref), jnp.asarray(dist)]), DIFF_TYPE_SSIM))
        assert out[:28].mean() > 5 * out[36:].mean()
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_ssim_sampler_end_to_end(self):
        """A PatchSampler with the SSIM diff map samples mostly from the
        distorted region (full CAPS path, jitted)."""
        from vtamiq_tpu.ops.sampling import (
            PatchSampler, DIFF_TYPE_SSIM, GRID_TYPE_PERTURBED)
        rng = np.random.default_rng(4)
        ref = rng.uniform(0.2, 0.8, (96, 96, 3)).astype(np.float32)
        dist = ref.copy()
        dist[:, 48:] = np.clip(dist[:, 48:] + rng.normal(0, 0.4, (96, 48, 3)), 0, 1)
        sampler = PatchSampler(diff_weight=1.0, uniform_weight=0.05,
                               grid_type=GRID_TYPE_PERTURBED,
                               diff_type=DIFF_TYPE_SSIM)
        imgs = jnp.stack([jnp.asarray(ref), jnp.asarray(dist)])
        diff = sampler.compute_diff(imgs)

        @jax.jit
        def draw(key):
            return sampler.sample(key, 96, 96, 16, 64, diff)

        pos = np.concatenate([np.asarray(draw(jax.random.PRNGKey(i)))
                              for i in range(8)], axis=1)
        assert np.mean(pos[1] > 40) > 0.7  # mass concentrated right


class TestRandomizePatchScaleOrder:
    def test_shuffles_scales_consistently_across_images(self):
        from vtamiq_tpu.ops.extraction import get_iqa_patches
        from vtamiq_tpu.ops.sampling import PatchSampler
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (128, 128, 3)).astype(np.float32)
        imgs = jnp.stack([jnp.asarray(img), jnp.asarray(np.clip(img + 0.1, 0, 1))])

        patches, pos, scales = get_iqa_patches(
            imgs, imgs, jax.random.PRNGKey(0), 48, 16, PatchSampler(),
            patch_num_scales=3, randomize_patch_scale_order=True)
        s0 = np.asarray(scales[0])
        # scales are interleaved, not sorted by scale
        assert not np.all(np.diff(s0) >= 0)
        # same permutation across images: scale sequences identical
        np.testing.assert_array_equal(s0, np.asarray(scales[1]))
        # per-scale budget preserved
        p_sorted, _, scales_sorted = get_iqa_patches(
            imgs, imgs, jax.random.PRNGKey(0), 48, 16, PatchSampler(),
            patch_num_scales=3, randomize_patch_scale_order=False)
        np.testing.assert_array_equal(
            np.bincount(s0, minlength=3),
            np.bincount(np.asarray(scales_sorted[0]), minlength=3))
