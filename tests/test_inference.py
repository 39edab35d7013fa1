"""Tests for the high-level inference API."""

import numpy as np
import jax
import pytest

from vtamiq_tpu.inference import VTAMIQScorer, score_pair
from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
from vtamiq_tpu.models.checkpoint import save_checkpoint, MODEL_STATE_DICT
from vtamiq_tpu.models.vtamiq import init_vtamiq_params

SMALL_CFG = VTAMIQConfig(vit=get_vit_config(num_keep_layers=1, num_extra_tokens=2,
                                            hidden_size=32, mlp_dim=64, num_heads=2),
                         num_rgs=1, num_rcabs=1, ca_reduction=4)


def imgs(seed=0, h=64, w=64):
    rng = np.random.default_rng(seed)
    ref = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    dist = np.clip(ref + rng.normal(0, 0.1, ref.shape).astype(np.float32), 0, 1)
    return ref, dist


class TestScorer:
    def test_score_pair_scalar(self):
        scorer = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16)
        ref, dist = imgs()
        q = scorer.score_pair(ref, dist)
        assert isinstance(q, float) and np.isfinite(q)

    def test_batch_and_pipeline_cache(self):
        scorer = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16)
        ref, dist = imgs()
        qs = scorer.score_batch([ref, ref], [dist, ref])
        assert qs.shape == (2,)
        assert len(scorer._pipelines) == 1
        scorer.score_batch([ref], [dist])  # new batch size -> new pipeline
        assert len(scorer._pipelines) == 2

    def test_repeats_average(self):
        scorer1 = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, num_repeats=1, seed=0)
        scorer4 = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, num_repeats=4, seed=0)
        ref, dist = imgs(2)
        q1 = scorer1.score_pair(ref, dist)
        q4 = scorer4.score_pair(ref, dist)
        assert np.isfinite(q1) and np.isfinite(q4)

    def test_from_checkpoint(self, tmp_path):
        params = init_vtamiq_params(jax.random.PRNGKey(1), SMALL_CFG)
        save_checkpoint(str(tmp_path), "best.npz", {MODEL_STATE_DICT: params},
                        epoch=3, srocc=0.91)
        scorer = VTAMIQScorer.from_checkpoint(str(tmp_path / "best.npz"),
                                              cfg=SMALL_CFG, patch_count=16)
        np.testing.assert_allclose(
            np.asarray(scorer.params["q_predictor"]["fc1"]["kernel"]),
            np.asarray(params["q_predictor"]["fc1"]["kernel"]))

    def test_mismatched_lengths_raise(self):
        scorer = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16)
        ref, dist = imgs()
        with pytest.raises(ValueError):
            scorer.score_batch([ref], [dist, dist])

    def test_functional_api(self):
        ref, dist = imgs(3)
        q = score_pair(ref, dist, cfg=SMALL_CFG, patch_count=16)
        assert np.isfinite(q)


class TestMixedSizeBatch:
    def test_buckets_by_size(self):
        scorer = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16)
        r1, d1 = imgs(0, 64, 64)
        r2, d2 = imgs(1, 64, 96)
        qs = scorer.score_batch([r1, r2], [d1, d2])
        assert qs.shape == (2,)
        assert np.isfinite(qs).all()
        assert len(scorer._pipelines) == 2  # one per size bucket

    def test_mismatched_pair_raises(self):
        scorer = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16)
        r1, _ = imgs(0, 64, 64)
        _, d2 = imgs(1, 64, 96)
        with pytest.raises(ValueError):
            scorer.score_batch([r1], [d2])


class TestCompare:
    def test_preference_matches_sigmoid_of_scores(self):
        """compare(ref, a, b) == sigmoid(q_a - q_b) of the same score_batch
        call — the default pairwise training convention preference_sigmoid
        (verified with a seed-matched scorer so patch draws align)."""
        ref, dist = imgs(0)
        s1 = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=42)
        s2 = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=42)
        p = s1.compare(ref, ref, dist)
        qs = s2.score_batch([ref, ref], [ref, dist])
        expected = 1.0 / (1.0 + np.exp(-(qs[0] - qs[1])))
        assert abs(p - expected) < 1e-5
        assert 0.0 <= p <= 1.0


class TestSizeBuckets:
    """Canonical-bucket scoring (round-3: serving over variable-size traffic
    with a bounded executable set — data/buckets.py wired into the scorer)."""

    def test_exact_bucket_matches_exact_path(self):
        """An image whose size IS a bucket shape scores identically through
        the bucket path (img_hw == bucket dims -> same positions/patches)."""
        ref, dist = imgs(5, 64, 64)
        s_exact = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=9)
        s_bucket = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=9,
                                size_buckets=[(64, 64), (128, 128)])
        q1 = s_exact.score_pair(ref, dist)
        q2 = s_bucket.score_pair(ref, dist)
        assert q1 == pytest.approx(q2, abs=1e-5)

    def test_mixed_sizes_share_executables(self):
        """6 distinct shapes, 2 buckets -> pipelines bounded by buckets, not
        shapes; all finite."""
        from vtamiq_tpu.data.buckets import compute_canonical_buckets
        shapes = [(48, 56), (56, 64), (64, 64), (80, 96), (96, 96), (96, 112)]
        buckets = compute_canonical_buckets(shapes, max_buckets=2)
        assert len(buckets) <= 2
        scorer = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16,
                              size_buckets=buckets)
        refs, dists = zip(*(imgs(i, h, w) for i, (h, w) in enumerate(shapes)))
        qs = scorer.score_batch(list(refs), list(dists))
        assert np.isfinite(qs).all()
        # one pipeline per (bucket, batch-size-of-group): <= 2 here since the
        # grouping collapses 6 shapes into <= 2 device batches
        assert len(scorer._pipelines) <= 2

    def test_padded_scores_track_exact_scores(self):
        """Bucket-padded scoring preserves the quality ORDERING the exact
        path produces across distortion strengths (padding must not leak
        into sampling/scores)."""
        rng = np.random.default_rng(7)
        ref = rng.uniform(0, 1, (56, 72, 3)).astype(np.float32)
        dists = [np.clip(ref + rng.normal(0, s, ref.shape), 0, 1
                         ).astype(np.float32) for s in (0.02, 0.1, 0.4)]
        s_exact = VTAMIQScorer(cfg=SMALL_CFG, patch_count=32, seed=3,
                               num_repeats=8)
        s_bucket = VTAMIQScorer(cfg=SMALL_CFG, patch_count=32, seed=3,
                                num_repeats=8, size_buckets=[(64, 96)])
        q_e = s_exact.score_batch([ref] * 3, dists)
        q_b = s_bucket.score_batch([ref] * 3, dists)
        assert np.isfinite(q_b).all()
        assert list(np.argsort(q_e)) == list(np.argsort(q_b))


class TestFromCheckpointValidation:
    def test_rejects_file_without_model_state(self, tmp_path):
        save_checkpoint(str(tmp_path), "empty.npz", {}, epoch=0, srocc=0.0)
        with pytest.raises(ValueError, match="no 'model_state_dict'"):
            VTAMIQScorer.from_checkpoint(str(tmp_path / "empty.npz"),
                                         cfg=SMALL_CFG, patch_count=16)

    def test_rejects_zero_leaf_merge(self, tmp_path):
        bogus = {"vit": {"bogus": np.zeros((3, 3), np.float32)}}
        save_checkpoint(str(tmp_path), "bogus.npz",
                        {MODEL_STATE_DICT: bogus}, epoch=0, srocc=0.0)
        with pytest.raises(ValueError, match="no checkpoint leaf matched"):
            VTAMIQScorer.from_checkpoint(str(tmp_path / "bogus.npz"),
                                         cfg=SMALL_CFG, patch_count=16)


class TestUint8Ingest:
    """ingest_uint8: uint8 host->device transfer + on-device /255 convert
    (4x less ingest traffic on tunneled devices; see VTAMIQScorer docstring)."""

    def test_uint8_matches_fp32_on_8bit_images(self):
        rng = np.random.default_rng(5)
        ref8 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        dist8 = np.clip(ref8.astype(np.int16)
                        + rng.integers(-20, 21, ref8.shape, dtype=np.int16),
                        0, 255).astype(np.uint8)
        ref_f = ref8.astype(np.float32) / 255.0
        dist_f = dist8.astype(np.float32) / 255.0
        s_f = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=11)
        s_u = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=11,
                           ingest_uint8=True)
        s_u.params = s_f.params
        s_u2 = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=11,
                            ingest_uint8=True)  # fresh: same sampling stream
        s_u2.params = s_f.params
        q_f = s_f.score_pair(ref_f, dist_f)
        q_u = s_u.score_pair(ref8, dist8)  # uint8 passthrough
        q_u2 = s_u2.score_pair(ref_f, dist_f)  # float input, host-quantized
        assert abs(q_f - q_u) <= max(2e-2, 4e-2 * abs(q_f))
        assert abs(q_u - q_u2) <= 1e-5  # same uint8 payload either way

    def test_uint8_input_without_ingest_uint8(self):
        """uint8 inputs are valid WITHOUT ingest_uint8 too: the scorer
        normalizes them to [0, 1] fp32 host-side (serving._load_npz passes
        uint8 payloads through, so this is the default-server contract)."""
        rng = np.random.default_rng(7)
        ref8 = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        s_a = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=3)
        s_b = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=3)
        s_b.params = s_a.params
        q_f = s_a.score_pair(ref8.astype(np.float32) / 255.0,
                             ref8.astype(np.float32) / 255.0)
        q_u = s_b.score_pair(ref8, ref8)
        assert abs(q_f - q_u) < 1e-5  # identical bytes on device

    def test_uint8_bucketed_path(self):
        rng = np.random.default_rng(6)
        scorer = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=2,
                              size_buckets=[(64, 64)], ingest_uint8=True)
        ref8 = rng.integers(0, 256, (48, 56, 3), dtype=np.uint8)
        q = scorer.score_pair(ref8, ref8)
        assert np.isfinite(q)
