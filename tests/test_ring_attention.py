"""Ring attention (sequence parallelism over a device mesh).

New TPU-native capability with no reference counterpart (SURVEY.md §2.5:
the reference is single-GPU with full quadratic attention,
transformer.py:158-164). Verified here on the 8-virtual-device CPU mesh:
exact parity with single-device attention for outputs AND gradients, on
pure-seq and mixed data+seq meshes, plus a sequence-sharded ViT forward.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vtamiq_tpu.parallel.ring_attention import (
    make_ring_attention, make_ring_attention_fn, make_seq_mesh)


def reference_attention(q, k, v, mask):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / math.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))


def make_qkvm(key, b=2, s=64, h=4, d=16, masked=True):
    kq, kk, kv, km = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, s, h, d), jnp.float32)
    v = jax.random.normal(kv, (b, s, h, d), jnp.float32)
    if masked:
        # leading-run valid masks (how the ViT pads token sequences)
        valid = jax.random.randint(km, (b,), s // 2, s + 1)
        mask = jnp.arange(s)[None, :] < valid[:, None]
    else:
        mask = jnp.ones((b, s), bool)
    return q, k, v, mask


@pytest.fixture(scope="module")
def seq_mesh():
    return make_seq_mesh(seq=8)


@pytest.fixture(scope="module")
def mixed_mesh():
    return make_seq_mesh(seq=4, data=2)


class TestRingAttention:
    def test_matches_reference(self, seq_mesh):
        q, k, v, mask = make_qkvm(jax.random.PRNGKey(0))
        ours = make_ring_attention(seq_mesh)(q, k, v, mask)
        ref = reference_attention(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_no_mask(self, seq_mesh):
        q, k, v, _ = make_qkvm(jax.random.PRNGKey(1), masked=False)
        ours = make_ring_attention(seq_mesh)(q, k, v, None)
        ref = reference_attention(q, k, v, None)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_mixed_data_seq_mesh(self, mixed_mesh):
        q, k, v, mask = make_qkvm(jax.random.PRNGKey(2), b=4, s=32)
        ours = make_ring_attention(mixed_mesh)(q, k, v, mask)
        ref = reference_attention(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_inside_jit(self, seq_mesh):
        q, k, v, mask = make_qkvm(jax.random.PRNGKey(3))
        attn = make_ring_attention(seq_mesh)
        ours = jax.jit(attn)(q, k, v, mask)
        ref = reference_attention(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gradients_match(self, seq_mesh):
        q, k, v, mask = make_qkvm(jax.random.PRNGKey(4), s=32)
        attn = make_ring_attention(seq_mesh)

        def loss_ring(q, k, v):
            return jnp.sum(jnp.sin(attn(q, k, v, mask)))

        def loss_ref(q, k, v):
            return jnp.sum(jnp.sin(reference_attention(q, k, v, mask)
                                   .astype(jnp.float32)))

        g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-5)

    def test_indivisible_seq_raises(self, seq_mesh):
        q, k, v, mask = make_qkvm(jax.random.PRNGKey(5), s=60)
        with pytest.raises(ValueError, match="not divisible"):
            make_ring_attention(seq_mesh)(q, k, v, mask)


class TestRingViT:
    def test_vit_forward_with_ring_attention(self, seq_mesh):
        """Sequence-sharded ViT forward (ring attention_fn) matches the
        single-device forward bit-for-bit in fp32."""
        from vtamiq_tpu.models.configs import get_vit_config
        from vtamiq_tpu.models.vit import init_vit_params, vit_forward

        cfg = get_vit_config(num_keep_layers=2, num_extra_tokens=8)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        n_patches = 119  # 119 + 9 tokens = 128 -> divisible by the ring of 8
        patches = jnp.asarray(
            rng.normal(size=(2, n_patches, 16, 16, 3)).astype(np.float32))
        pos = jnp.asarray(rng.uniform(size=(2, n_patches, 2)).astype(np.float32))

        ring_fn = make_ring_attention_fn(seq_mesh, batch_axis=None)
        tok_ring = vit_forward(params, cfg, patches, pos,
                               compute_dtype=jnp.float32,
                               attention_fn=ring_fn)
        tok_ref = vit_forward(params, cfg, patches, pos,
                              compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(tok_ring), np.asarray(tok_ref),
                                   atol=1e-5, rtol=1e-5)


class TestRingFlashPallas:
    def test_pallas_chunks_match_exact_fwd_bwd(self, seq_mesh):
        """Round 3: the ring with PALLAS flash chunks (interpret mode) —
        per-chunk (out, lse) merged by online logsumexp, backward via the
        FlashAttention-2 kernels over the GLOBAL lse with (k, v, dk, dv)
        rotating home — matches exact attention fwd + grads."""
        import math
        from jax.experimental.pallas import tpu as pltpu
        B, S, H, D = 2, 1024, 2, 32  # S/8 = 128-multiple local shards
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(9), 3)
        q = jax.random.normal(kq, (B, S, H, D), jnp.float32) * 0.3
        k = jax.random.normal(kk, (B, S, H, D), jnp.float32) * 0.3
        v = jax.random.normal(kv, (B, S, H, D), jnp.float32)
        mask = jnp.ones((B, S), bool).at[:, 900:].set(False)

        attn = make_ring_attention(seq_mesh, use_flash=True)

        def loss_ring(q, k, v):
            return jnp.sum(attn(q, k, v, mask) ** 2)

        def loss_exact(q, k, v):
            return jnp.sum(reference_attention(q, k, v, mask) ** 2)

        with pltpu.force_tpu_interpret_mode():
            out = attn(q, k, v, mask)
            g1 = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        ref = reference_attention(q, k, v, mask)
        g2 = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-5)
        # masked keys: zero dk/dv through the whole ring
        assert float(jnp.abs(g1[1][:, 900:]).max()) == 0.0
        assert float(jnp.abs(g1[2][:, 900:]).max()) == 0.0


    def test_small_shard_falls_back_to_einsum_body(self, seq_mesh):
        """use_flash=True with S_local=64 (no 128-aligned block divisor,
        e.g. the 500-patch config's 512 tokens over seq=8) must take the
        einsum chunk body instead of failing at trace time (Mosaic needs
        128-lane blocks) — fwd AND grads still match exact attention."""
        q, k, v, mask = make_qkvm(jax.random.PRNGKey(3), s=512)
        attn = make_ring_attention(seq_mesh, use_flash=True)
        out = attn(q, k, v, mask)  # old code: ValueError at trace
        ref = reference_attention(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)
        g1 = jax.grad(lambda *a: jnp.sum(attn(*a, mask) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(
            lambda *a: jnp.sum(reference_attention(*a, mask) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-5, rtol=5e-5)
