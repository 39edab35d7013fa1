"""Flash/blockwise attention tests: equivalence with exact attention,
masking, gradients (CPU path; the Pallas kernel itself runs on TPU and is
exercised by bench/graft)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtamiq_tpu.ops.attention import (
    blockwise_attention, flash_attention, make_attention_fn,
)


def exact_attention(q, k, v, mask=None):
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def make_qkv(b=2, s=192, h=2, d=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
    return mk(), mk(), mk()


class TestBlockwise:
    def test_matches_exact(self):
        q, k, v = make_qkv()
        out = blockwise_attention(q, k, v, block_k=64)
        ref = exact_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_matches_exact_nondivisible_s(self):
        q, k, v = make_qkv(s=100)  # not a multiple of block_k
        out = blockwise_attention(q, k, v, block_k=64)
        ref = exact_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_mask(self):
        q, k, v = make_qkv(s=128)
        mask = jnp.ones((2, 128), bool).at[:, 64:].set(False)
        out = blockwise_attention(q, k, v, mask, block_k=32)
        ref = exact_attention(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
        # masked keys must not affect the result at all
        v2 = v.at[:, 64:].set(123.0)
        k2 = k.at[:, 64:].set(-7.0)
        out2 = blockwise_attention(q, k2, v2, mask, block_k=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-6, atol=1e-6)


class TestFlashAttention:
    def test_cpu_path_matches_exact(self):
        q, k, v = make_qkv(s=256)
        out = flash_attention(q, k, v, block_q=128, block_k=128, use_pallas=False)
        ref = exact_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_pad_and_mask(self):
        q, k, v = make_qkv(s=300)  # pads to 512 internally
        mask = jnp.ones((2, 300), bool).at[:, 250:].set(False)
        out = flash_attention(q, k, v, mask, block_q=256, block_k=256, use_pallas=False)
        ref = exact_attention(q, k, v, mask)
        assert out.shape == q.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_gradients_match_exact(self):
        q, k, v = make_qkv(s=128, b=1, h=1, d=16)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64,
                                           use_pallas=False) ** 2)

        def loss_exact(q, k, v):
            return jnp.sum(exact_attention(q, k, v) ** 2)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_pallas_kernel_interpret_mode(self):
        """Run the actual Pallas kernel in interpreter mode on CPU."""
        from jax.experimental.pallas import tpu as pltpu
        q, k, v = make_qkv(b=1, s=256, h=1, d=32)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, block_q=128, block_k=128, use_pallas=True)
        ref = exact_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_pallas_kernel_interpret_mode_masked(self):
        from jax.experimental.pallas import tpu as pltpu
        q, k, v = make_qkv(b=2, s=256, h=2, d=32, seed=3)
        mask = jnp.ones((2, 256), bool).at[:, 200:].set(False)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, mask, block_q=128, block_k=128,
                                  use_pallas=True)
        ref = exact_attention(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_pallas_backward_kernels_match_exact(self):
        """The FlashAttention-2 dq/dkv Pallas kernels (interpret mode)
        against autodiff through exact attention."""
        from jax.experimental.pallas import tpu as pltpu
        q, k, v = make_qkv(b=2, s=256, h=2, d=32, seed=5)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, block_q=128, block_k=128,
                                           use_pallas=True) ** 2)

        def loss_exact(q, k, v):
            return jnp.sum(exact_attention(q, k, v) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_pallas_backward_distinct_bwd_blocks(self):
        """bwd_block_q/bwd_block_k tile the backward independently of the
        forward (incl. a bwd block LARGER than the fwd one, which drives
        the padding) — gradients must match exact autodiff regardless."""
        from jax.experimental.pallas import tpu as pltpu
        q, k, v = make_qkv(b=1, s=192, h=2, d=32, seed=11)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=128,
                                           bwd_block_q=128, bwd_block_k=256,
                                           use_pallas=True) ** 2)

        def loss_exact(q, k, v):
            return jnp.sum(exact_attention(q, k, v) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)

    def test_pallas_backward_masked_and_padded(self):
        """Key mask + non-divisible S (internal padding): pad/masked keys
        get ZERO gradient and real grads match exact autodiff."""
        from jax.experimental.pallas import tpu as pltpu
        q, k, v = make_qkv(b=1, s=200, h=2, d=32, seed=7)  # pads to 256
        mask = jnp.ones((1, 200), bool).at[:, 160:].set(False)

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, mask, block_q=128,
                                           block_k=128, use_pallas=True) ** 2)

        def loss_exact(q, k, v):
            return jnp.sum(exact_attention(q, k, v, mask) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_exact, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=5e-4)
        # masked keys contribute nothing -> dk/dv zero there
        assert float(jnp.abs(g1[1][:, 160:]).max()) == 0.0
        assert float(jnp.abs(g1[2][:, 160:]).max()) == 0.0

    def test_fused_backward_matches_split(self):
        """The single-pass fused backward (5 matmuls/tile, dq via per-k-block
        fp32 partials) against the split dq+dkv kernel pair AND exact
        autodiff — same grads from either kernel arrangement (round-4
        VERDICT item 2; masked + padded to cover the mask plumbing)."""
        from jax.experimental.pallas import tpu as pltpu
        q, k, v = make_qkv(b=2, s=200, h=2, d=32, seed=13)  # pads to 256
        mask = jnp.ones((2, 200), bool).at[:, 170:].set(False)

        def loss(fused):
            def f(q, k, v):
                return jnp.sum(flash_attention(
                    q, k, v, mask, block_q=128, block_k=128,
                    use_pallas=True, fused_bwd=fused) ** 2)
            return f

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss(True), argnums=(0, 1, 2))(q, k, v)
            g_split = jax.grad(loss(False), argnums=(0, 1, 2))(q, k, v)
        g_exact = jax.grad(
            lambda q, k, v: jnp.sum(exact_attention(q, k, v, mask) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b, e in zip(g_fused, g_split, g_exact):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                       rtol=5e-4, atol=5e-4)


class TestAttentionFnIntegration:
    def test_small_seq_uses_exact(self):
        fn = make_attention_fn(threshold=512)
        q, k, v = make_qkv(s=128)
        out = fn(q, k, v, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(exact_attention(q, k, v)),
                                   rtol=2e-5, atol=2e-5)

    def test_vit_forward_with_flash(self):
        from vtamiq_tpu.models.configs import get_vit_config
        from vtamiq_tpu.models.vit import init_vit_params, vit_forward
        cfg = get_vit_config(num_keep_layers=1, num_extra_tokens=4,
                             hidden_size=64, mlp_dim=128, num_heads=2)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        patches = jnp.asarray(rng.normal(size=(2, 20, 16, 16, 3)), jnp.float32)
        pos = jnp.asarray(rng.uniform(0, 1 - 1e-6, size=(2, 20, 2)), jnp.float32)
        out_exact = vit_forward(params, cfg, patches, pos, compute_dtype=jnp.float32)
        out_flash = vit_forward(params, cfg, patches, pos, compute_dtype=jnp.float32,
                                attention_fn=make_attention_fn(threshold=1))
        np.testing.assert_allclose(np.asarray(out_exact), np.asarray(out_flash),
                                   rtol=1e-4, atol=1e-4)


class TestPallasGatherKernel:
    """VMEM-resident gather (ops/gather_kernel.py): the production TPU
    gather path; exercised here under the Pallas interpreter (CPU). Verified
    numerically on real v5e hardware too (fp32 + bf16 round-trip,
    tools session logs, round 2)."""

    def _reference(self, img, ti, tj, P):
        return np.stack([np.asarray(img)[i:i + P, j:j + P]
                         for i, j in zip(np.asarray(ti), np.asarray(tj))])

    def test_interpret_mode_exact_fp32(self):
        from jax.experimental.pallas import tpu as pltpu
        from vtamiq_tpu.ops.gather_kernel import pallas_gather_patches
        rng = np.random.default_rng(0)
        H, W, N, P = 64, 96, 20, 16
        img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
        ti = jnp.asarray(rng.integers(0, H - P, N), jnp.int32)
        tj = jnp.asarray(rng.integers(0, W - P, N), jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            out = pallas_gather_patches(img, ti, tj, P)
        np.testing.assert_array_equal(np.asarray(out), self._reference(img, ti, tj, P))

    def test_interpret_mode_bf16_roundtrip(self):
        """16-bit inputs route through fp32 inside the kernel (Mosaic dynamic
        rotate is 32-bit only) and come back bit-identical."""
        from jax.experimental.pallas import tpu as pltpu
        from vtamiq_tpu.ops.gather_kernel import pallas_gather_patches
        rng = np.random.default_rng(1)
        H, W, N, P = 48, 64, 11, 16
        img = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.bfloat16)
        ti = jnp.asarray(rng.integers(0, H - P, N), jnp.int32)
        tj = jnp.asarray(rng.integers(0, W - P, N), jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            out = pallas_gather_patches(img, ti, tj, P)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(out.astype(jnp.float32)),
            self._reference(img.astype(jnp.float32), ti, tj, P))

    def test_edge_positions(self):
        """Extreme top-lefts (0 and dim-P) hit the aligned-band clamping."""
        from jax.experimental.pallas import tpu as pltpu
        from vtamiq_tpu.ops.gather_kernel import pallas_gather_patches
        H, W, P = 40, 48, 16
        img = jnp.arange(H * W * 3, dtype=jnp.float32).reshape(H, W, 3)
        ti = jnp.asarray([0, H - P, 3, H - P - 1], jnp.int32)
        tj = jnp.asarray([0, W - P, W - P, 1], jnp.int32)
        with pltpu.force_tpu_interpret_mode():
            out = pallas_gather_patches(img, ti, tj, P)
        np.testing.assert_array_equal(np.asarray(out), self._reference(img, ti, tj, P))

    def test_vmem_budget_gate(self):
        from vtamiq_tpu.ops.gather_kernel import vmem_gather_supported
        assert vmem_gather_supported((384, 512, 3), jnp.bfloat16)
        assert not vmem_gather_supported((385, 512, 3), jnp.bfloat16)  # H % 8
        assert not vmem_gather_supported((4096, 4096, 3), jnp.float32)  # bytes

    def test_vmem_budget_counts_output_block(self):
        """grid=(1,) keeps the whole (N*P, P*C) output in VMEM: a 5000-patch
        fp32 request (~15 MB output) must fall back to XLA even though the
        image alone fits (ADVICE r2: Mosaic fails with no fallback there)."""
        from vtamiq_tpu.ops.gather_kernel import vmem_gather_supported
        shape = (384, 512, 3)
        assert vmem_gather_supported(shape, jnp.float32, 16, num_patches=500,
                                     out_dtype=jnp.float32)
        assert not vmem_gather_supported(shape, jnp.float32, 16,
                                         num_patches=5000,
                                         out_dtype=jnp.float32)
        # bf16 output halves the block; 5000 patches fit again
        assert vmem_gather_supported(shape, jnp.float32, 16, num_patches=5000,
                                     out_dtype=jnp.bfloat16)
