"""Tests for the opt-in int8 serving quantization (ops/quant.py).

The reference has no quantized path (torch fp32 serving, vtamiq.py:94-119);
this is a new TPU capability, so the tests anchor against our own fp32
forward rather than a torch golden: quantization error must stay at the
W8A8-rounding level through the full encoder, and the dispatch must be
invisible to every other code path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
from vtamiq_tpu.models.vit import dense, init_vit_params, vit_forward
from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
from vtamiq_tpu.ops.quant import (
    MIN_QUANT_DIM,
    count_quantized_leaves,
    dense_q8,
    quantize_dense_params,
    quantize_params_int8,
)

SMALL_VIT = get_vit_config(num_keep_layers=2, num_extra_tokens=8,
                           hidden_size=64, mlp_dim=128, num_heads=4)
SMALL_CFG = VTAMIQConfig(vit=SMALL_VIT, num_rgs=2, num_rcabs=2, ca_reduction=8)


def _dense_leaf(rng, d_in, d_out, scale=0.05):
    return {"kernel": jnp.asarray(rng.normal(size=(d_in, d_out)) * scale,
                                  jnp.float32),
            "bias": jnp.asarray(rng.normal(size=(d_out,)) * 0.01, jnp.float32)}


class TestQuantizeDense:
    def test_roundtrip_error_bounded_by_half_step(self):
        rng = np.random.default_rng(0)
        p = _dense_leaf(rng, 128, 256)
        q = quantize_dense_params(p)
        assert q["kernel_q8"].dtype == jnp.int8
        deq = q["kernel_q8"].astype(jnp.float32) * q["kernel_scale"][None, :]
        # symmetric rounding: |err| <= scale/2 elementwise, per output column
        err = jnp.abs(deq - p["kernel"])
        assert bool(jnp.all(err <= q["kernel_scale"][None, :] * 0.5 + 1e-8))

    def test_per_channel_scales_hit_127(self):
        rng = np.random.default_rng(1)
        p = _dense_leaf(rng, 64, 64)
        q = quantize_dense_params(p)
        # every column's max-magnitude weight maps to +-127 exactly
        assert bool(jnp.all(jnp.max(jnp.abs(q["kernel_q8"]), axis=0) == 127))

    def test_dense_q8_matches_fp32_to_quant_noise(self):
        rng = np.random.default_rng(2)
        p = _dense_leaf(rng, 768, 768)
        x = jnp.asarray(rng.normal(size=(32, 768)), jnp.float32)
        y_fp = dense(p, x)
        y_q8 = dense_q8(quantize_dense_params(p), x)
        rel = float(jnp.linalg.norm(y_q8 - y_fp) / jnp.linalg.norm(y_fp))
        assert rel < 2e-2, rel

    def test_dense_dispatches_on_quantized_leaf(self):
        rng = np.random.default_rng(3)
        p = _dense_leaf(rng, 64, 64)
        pq = quantize_dense_params(p)
        x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
        np.testing.assert_allclose(np.asarray(dense(pq, x)),
                                   np.asarray(dense_q8(pq, x)))

    def test_dense_q8_respects_leading_dims_and_dtype(self):
        rng = np.random.default_rng(4)
        pq = quantize_dense_params(_dense_leaf(rng, 64, 96))
        x = jnp.asarray(rng.normal(size=(2, 3, 5, 64)), jnp.bfloat16)
        y = dense_q8(pq, x)
        assert y.shape == (2, 3, 5, 96) and y.dtype == jnp.bfloat16


class TestTreeRewrite:
    def test_walk_skips_small_leaves_and_non_dense(self):
        rng = np.random.default_rng(5)
        tree = {
            "big": _dense_leaf(rng, MIN_QUANT_DIM, MIN_QUANT_DIM),
            "narrow": _dense_leaf(rng, 256, MIN_QUANT_DIM - 1),
            "nested": {"inner": _dense_leaf(rng, 128, 128)},
            "ln": {"scale": jnp.ones(64), "bias": jnp.zeros(64)},
            "emb": jnp.zeros((10, 64)),
        }
        out = quantize_params_int8(tree)
        assert count_quantized_leaves(out) == 2
        assert "kernel" in out["narrow"] and "kernel_q8" not in out["narrow"]
        assert "kernel_q8" in out["big"] and "kernel_q8" in out["nested"]["inner"]
        # untouched leaves are shared, not copied
        assert out["emb"] is tree["emb"]
        assert count_quantized_leaves(tree) == 0  # input not mutated

    def test_idempotent(self):
        rng = np.random.default_rng(6)
        tree = {"a": _dense_leaf(rng, 64, 64)}
        once = quantize_params_int8(tree)
        twice = quantize_params_int8(once)
        assert count_quantized_leaves(twice) == 1
        np.testing.assert_array_equal(np.asarray(once["a"]["kernel_q8"]),
                                      np.asarray(twice["a"]["kernel_q8"]))

    def test_vit_tree_quantizes_encoder_matmuls(self):
        params = init_vit_params(jax.random.PRNGKey(0), SMALL_VIT)
        q = quantize_params_int8(params)
        # 2 layers x (q,k,v,out,fc1,fc2) + patch embed = 13 at hidden 64
        assert count_quantized_leaves(q) >= 2 * 6


class TestEndToEnd:
    def test_vit_forward_quantized_tracks_fp32(self):
        rng = np.random.default_rng(7)
        params = init_vit_params(jax.random.PRNGKey(0), SMALL_VIT)
        qparams = quantize_params_int8(params)
        patches = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 3)), jnp.float32)
        pos = jnp.asarray(rng.uniform(0, 1 - 1e-6, size=(2, 16, 2)), jnp.float32)
        # fp32 compute isolates W8A8 rounding from bf16 noise
        f = vit_forward(params, SMALL_VIT, patches, pos,
                        compute_dtype=jnp.float32)
        fq = vit_forward(qparams, SMALL_VIT, patches, pos,
                         compute_dtype=jnp.float32)
        cos = float(jnp.sum(f * fq) /
                    (jnp.linalg.norm(f) * jnp.linalg.norm(fq)))
        assert cos > 0.995, cos

    def test_vtamiq_scores_quantized_encoder_close(self):
        rng = np.random.default_rng(8)
        params = init_vtamiq_params(jax.random.PRNGKey(1), SMALL_CFG)
        qparams = dict(params)
        qparams["vit"] = quantize_params_int8(params["vit"])
        patches = jnp.asarray(rng.normal(size=(4, 2, 16, 16, 16, 3)),
                              jnp.float32)
        pos = jnp.asarray(rng.uniform(0, 1 - 1e-6, size=(4, 2, 16, 2)),
                          jnp.float32)
        q = vtamiq_forward(params, SMALL_CFG, patches, pos,
                           compute_dtype=jnp.float32)
        qq = vtamiq_forward(qparams, SMALL_CFG, patches, pos,
                            compute_dtype=jnp.float32)
        spread = float(jnp.max(q) - jnp.min(q)) + 1e-9
        assert float(jnp.max(jnp.abs(qq - q))) / spread < 0.15, (q, qq)

    def test_scorer_flag_quantizes_lazily(self):
        from vtamiq_tpu.inference import VTAMIQScorer
        rng = np.random.default_rng(9)
        imgs = [rng.random((48, 64, 3)).astype(np.float32) for _ in range(4)]
        base = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=3)
        quant = VTAMIQScorer(cfg=SMALL_CFG, patch_count=16, seed=3,
                             quantize_int8=True)
        # lazy: nothing rewritten until the first score
        assert count_quantized_leaves(quant.params["vit"]) == 0
        s0 = base.score_batch(imgs[:2], imgs[2:])
        s1 = quant.score_batch(imgs[:2], imgs[2:])
        assert count_quantized_leaves(quant.params["vit"]) > 0
        assert np.all(np.isfinite(s1))
        # same seed => same patches; scores differ only by quant noise
        np.testing.assert_allclose(s1, s0, atol=0.2)
