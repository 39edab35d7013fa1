"""Model tests: shapes, masking/padding invariances, npz loading, and golden
parity against the torch reference implementation."""

import math
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtamiq_tpu.models.configs import (
    get_vit_config, ViTConfig, VTAMIQConfig, VIT_VARIANT_B16, VIT_VARIANT_L16,
)
from vtamiq_tpu.models.vit import (
    init_vit_params, vit_forward, load_vit_npz, uv_pos_lookup, scale_lookup,
    layer_norm, pad_to_multiple,
)
from vtamiq_tpu.models.vtamiq import (
    init_vtamiq_params, vtamiq_forward, vtamiq_forward_single_tower,
)
from vtamiq_tpu.models.preference import (
    init_preference_params, preference_forward, preference_sigmoid,
)

SMALL_VIT = get_vit_config(num_keep_layers=2, num_extra_tokens=8,
                           hidden_size=64, mlp_dim=128, num_heads=4)
SMALL_CFG = VTAMIQConfig(vit=SMALL_VIT, num_rgs=2, num_rcabs=2, ca_reduction=8)


def make_inputs(b=2, n=16, p=16, seed=0, towers=None):
    rng = np.random.default_rng(seed)
    shape = (b, n, p, p, 3) if towers is None else (b, towers, n, p, p, 3)
    pshape = (b, n, 2) if towers is None else (b, towers, n, 2)
    patches = jnp.asarray(rng.normal(size=shape), jnp.float32)
    pos = jnp.asarray(rng.uniform(0, 1 - 1e-6, size=pshape), jnp.float32)
    return patches, pos


class TestViTConfig:
    def test_variants(self):
        b16 = get_vit_config(VIT_VARIANT_B16)
        assert b16.hidden_size == 768 and b16.num_layers == 12 and b16.pos_grid == 24
        l16 = get_vit_config(VIT_VARIANT_L16)
        assert l16.hidden_size == 1024 and l16.num_layers == 24

    def test_variant_short_names(self):
        # the profiler CLI passes bare "B16"/"B8"/"L16" (tools/profiler.py
        # --variant); both spellings must resolve to the same config
        for short, canon in (("B16", VIT_VARIANT_B16), ("L16", VIT_VARIANT_L16)):
            assert get_vit_config(short) == get_vit_config(canon)
        with pytest.raises(ValueError):
            get_vit_config("H14")

    def test_keep_layers(self):
        assert get_vit_config(num_keep_layers=6).effective_num_layers == 6
        assert get_vit_config(num_keep_layers=-1).effective_num_layers == 12
        assert get_vit_config(num_keep_layers=99).effective_num_layers == 12

    def test_num_tokens(self):
        assert get_vit_config(num_extra_tokens=8).num_tokens == 9


class TestViTForward:
    def test_output_shape_tokens_only(self):
        params = init_vit_params(jax.random.PRNGKey(0), SMALL_VIT)
        patches, pos = make_inputs()
        out = vit_forward(params, SMALL_VIT, patches, pos, compute_dtype=jnp.float32)
        assert out.shape == (2, SMALL_VIT.num_tokens, SMALL_VIT.hidden_size)
        assert out.dtype == jnp.float32

    def test_padding_invariance(self):
        """Padding the token sequence (with masking) must not change outputs."""
        params = init_vit_params(jax.random.PRNGKey(0), SMALL_VIT)
        patches, pos = make_inputs(n=17)  # 17+9=26 tokens, pads to 128
        out_nopad = vit_forward(params, SMALL_VIT, patches, pos,
                                compute_dtype=jnp.float32, pad_seq_to=None)
        out_pad = vit_forward(params, SMALL_VIT, patches, pos,
                              compute_dtype=jnp.float32, pad_seq_to=128)
        np.testing.assert_allclose(np.asarray(out_nopad), np.asarray(out_pad),
                                   rtol=1e-5, atol=1e-5)

    def test_patch_mask_excludes_patches(self):
        """Masked patches must not influence the CLS token."""
        params = init_vit_params(jax.random.PRNGKey(0), SMALL_VIT)
        patches, pos = make_inputs(n=16)
        mask = jnp.ones((2, 16), bool).at[:, 8:].set(False)
        out_masked = vit_forward(params, SMALL_VIT, patches, pos,
                                 patch_mask=mask, compute_dtype=jnp.float32)
        # corrupt the masked patches; output must be identical
        patches2 = patches.at[:, 8:].set(999.0)
        out_masked2 = vit_forward(params, SMALL_VIT, patches2, pos,
                                  patch_mask=mask, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out_masked), np.asarray(out_masked2),
                                   rtol=1e-5, atol=1e-5)

    def test_scale_embedding_used(self):
        cfg = get_vit_config(num_keep_layers=1, hidden_size=64, mlp_dim=128,
                             num_heads=4, num_scales=3)
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        patches, pos = make_inputs(n=8)
        scales = jnp.zeros((2, 8), jnp.int32)
        out0 = vit_forward(params, cfg, patches, pos, scales, compute_dtype=jnp.float32)
        out1 = vit_forward(params, cfg, patches, pos, scales + 1, compute_dtype=jnp.float32)
        assert not np.allclose(np.asarray(out0), np.asarray(out1))
        with pytest.raises(ValueError):
            vit_forward(params, cfg, patches, pos, None)

    def test_uv_lookup_indexing(self):
        table = jnp.arange(577 * 4, dtype=jnp.float32).reshape(577, 4)
        # u=v=0 -> index 1; u,v near 1 -> index 24*24 = 576
        out = uv_pos_lookup(table, jnp.array([[0.0, 0.0], [0.999, 0.999]]), 24)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(table[1]))
        np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(table[576]))

    def test_scale_lookup_clamps(self):
        table = jnp.arange(4 * 2, dtype=jnp.float32).reshape(4, 2)  # 3 scales + cls
        out = scale_lookup(table, jnp.array([-5, 0, 2, 99]), 3)
        np.testing.assert_array_equal(np.asarray(out),
                                      np.asarray(table[jnp.array([1, 1, 3, 3])]))

    def test_pad_to_multiple(self):
        assert pad_to_multiple(509, 128) == 512
        assert pad_to_multiple(128, 128) == 128


class TestVTAMIQForward:
    def test_output_shape_and_jit(self):
        params = init_vtamiq_params(jax.random.PRNGKey(0), SMALL_CFG)
        patches, pos = make_inputs(b=3, n=16, towers=2)
        fwd = jax.jit(lambda p, x, uv: vtamiq_forward(p, SMALL_CFG, x, uv,
                                                      compute_dtype=jnp.float32))
        q = fwd(params, patches, pos)
        assert q.shape == (3,)
        assert np.isfinite(np.asarray(q)).all()

    def test_identical_towers_near_zero_diff(self):
        """ref == dist -> cls_diff == 0; q is then a constant bias output."""
        params = init_vtamiq_params(jax.random.PRNGKey(0), SMALL_CFG)
        patches, pos = make_inputs(b=2, n=16, towers=2)
        same = patches.at[:, 1].set(patches[:, 0])
        same_pos = pos.at[:, 1].set(pos[:, 0])
        q = vtamiq_forward(params, SMALL_CFG, same, same_pos, compute_dtype=jnp.float32)
        # both batch items see zero diff -> identical outputs
        assert abs(float(q[0] - q[1])) < 1e-5

    def test_mixed_policy_tracks_fp32(self):
        """compute_dtype="mixed" (fp32 residual stream, bf16 MXU matmuls)
        must land closer to fp32 than the pure-bf16 stream does — it exists
        because a bf16 stream destabilizes from-scratch training (round-5
        collapse diagnosis, docs/PARITY.md)."""
        params = init_vtamiq_params(jax.random.PRNGKey(0), SMALL_CFG)
        patches, pos = make_inputs(b=3, n=16, towers=2)
        q32 = np.asarray(vtamiq_forward(params, SMALL_CFG, patches, pos,
                                        compute_dtype=jnp.float32))
        qmx = np.asarray(vtamiq_forward(params, SMALL_CFG, patches, pos,
                                        compute_dtype="mixed"))
        assert np.isfinite(qmx).all()
        # single-sample mixed-vs-bf16 error ordering is chaotic on a tiny
        # random model (the head amplifies cls_diff); the contract is that
        # mixed stays in fp32's neighborhood
        assert np.abs(qmx - q32).max() < 0.1 * max(np.abs(q32).max(), 1.0)

    def test_single_tower_wrapper(self):
        params = init_vtamiq_params(jax.random.PRNGKey(0), SMALL_CFG)
        patches, pos = make_inputs(b=2, n=16)
        q = vtamiq_forward_single_tower(params, SMALL_CFG, patches, pos,
                                        compute_dtype=jnp.float32)
        assert q.shape == ()

    def test_train_mode_stochastic(self):
        params = init_vtamiq_params(jax.random.PRNGKey(0), SMALL_CFG)
        patches, pos = make_inputs(b=2, n=16, towers=2)
        q1 = vtamiq_forward(params, SMALL_CFG, patches, pos, train=True,
                            rng=jax.random.PRNGKey(1), compute_dtype=jnp.float32)
        q2 = vtamiq_forward(params, SMALL_CFG, patches, pos, train=True,
                            rng=jax.random.PRNGKey(2), compute_dtype=jnp.float32)
        # dropout + RG droppath make train-mode outputs rng-dependent
        assert not np.allclose(np.asarray(q1), np.asarray(q2))

    def test_no_calibrate_no_diffscale(self):
        cfg = VTAMIQConfig(vit=SMALL_VIT, calibrate=False, diff_scale=False)
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        assert "quality_decoder" not in params and "diff_scale" not in params
        patches, pos = make_inputs(b=2, n=8, towers=2)
        q = vtamiq_forward(params, cfg, patches, pos, compute_dtype=jnp.float32)
        assert q.shape == (2,)


class TestPreference:
    def test_sigmoid_path(self):
        q1, q2 = jnp.array([0.0]), jnp.array([1.0])
        # lower q = better; q1 better -> sigmoid(q1-q2) < 0.5
        assert float(preference_sigmoid(q1, q2)[0]) < 0.5

    def test_module_path(self):
        params = init_preference_params(weight=6.0)
        p = preference_forward(params, jnp.array([0.0]), jnp.array([1.0]))[0]
        assert float(p) > 0.5  # p*(q2-q1) = 6 -> strongly prefers image 1


def make_fake_npz(cfg: ViTConfig, grid: int = None, rng=None):
    """Synthesize a jax-format ViT npz with the reference key structure
    (transformer.py:643-668) for loader tests."""
    rng = rng or np.random.default_rng(0)
    h, m = cfg.hidden_size, cfg.mlp_dim
    p = cfg.patch_size
    grid = grid or cfg.pos_grid
    d = {
        "embedding/kernel": rng.normal(size=(p, p, 3, h)).astype(np.float32),
        "embedding/bias": rng.normal(size=(h,)).astype(np.float32),
        "cls": rng.normal(size=(1, 1, h)).astype(np.float32),
        "Transformer/posembed_input/pos_embedding":
            rng.normal(size=(1, grid * grid + 1, h)).astype(np.float32),
        "Transformer/encoder_norm/scale": rng.normal(size=(h,)).astype(np.float32),
        "Transformer/encoder_norm/bias": rng.normal(size=(h,)).astype(np.float32),
    }
    nh, hd = cfg.num_heads, cfg.head_dim
    for i in range(cfg.num_layers):
        root = f"Transformer/encoderblock_{i}"
        att = f"{root}/MultiHeadDotProductAttention_1"
        for name in ("query", "key", "value"):
            d[f"{att}/{name}/kernel"] = rng.normal(size=(h, nh, hd)).astype(np.float32)
            d[f"{att}/{name}/bias"] = rng.normal(size=(nh, hd)).astype(np.float32)
        d[f"{att}/out/kernel"] = rng.normal(size=(nh, hd, h)).astype(np.float32)
        d[f"{att}/out/bias"] = rng.normal(size=(h,)).astype(np.float32)
        d[f"{root}/MlpBlock_3/Dense_0/kernel"] = rng.normal(size=(h, m)).astype(np.float32)
        d[f"{root}/MlpBlock_3/Dense_0/bias"] = rng.normal(size=(m,)).astype(np.float32)
        d[f"{root}/MlpBlock_3/Dense_1/kernel"] = rng.normal(size=(m, h)).astype(np.float32)
        d[f"{root}/MlpBlock_3/Dense_1/bias"] = rng.normal(size=(h,)).astype(np.float32)
        d[f"{root}/LayerNorm_0/scale"] = rng.normal(size=(h,)).astype(np.float32)
        d[f"{root}/LayerNorm_0/bias"] = rng.normal(size=(h,)).astype(np.float32)
        d[f"{root}/LayerNorm_2/scale"] = rng.normal(size=(h,)).astype(np.float32)
        d[f"{root}/LayerNorm_2/bias"] = rng.normal(size=(h,)).astype(np.float32)
    return d


class TestNpzLoading:
    def test_load_all_keys(self):
        cfg = get_vit_config(num_keep_layers=2, hidden_size=32, mlp_dim=64,
                             num_heads=2, num_extra_tokens=4)
        npz = make_fake_npz(cfg)
        params = load_vit_npz(npz, cfg, rng=jax.random.PRNGKey(0))
        h = cfg.hidden_size
        np.testing.assert_allclose(
            np.asarray(params["embeddings"]["patch"]["kernel"]),
            npz["embedding/kernel"].reshape(-1, h))
        np.testing.assert_allclose(
            np.asarray(params["embeddings"]["cls_token"]), npz["cls"].reshape(-1))
        np.testing.assert_allclose(
            np.asarray(params["encoder"]["layers"]["layer_1"]["mlp"]["fc1"]["kernel"]),
            npz["Transformer/encoderblock_1/MlpBlock_3/Dense_0/kernel"])
        # attention kernels reshaped (H, heads, d) -> (H, H)
        np.testing.assert_allclose(
            np.asarray(params["encoder"]["layers"]["layer_0"]["attn"]["query"]["kernel"]),
            npz["Transformer/encoderblock_0/MultiHeadDotProductAttention_1/query/kernel"]
            .reshape(h, h))
        # extra tokens keep their random init (not in npz)
        assert params["embeddings"]["extra_tokens"].shape == (4, h)

    def test_posemb_zoom(self):
        cfg = get_vit_config(num_keep_layers=1, hidden_size=32, mlp_dim=64,
                             num_heads=2, img_dim=384)  # pos_grid 24
        npz = make_fake_npz(cfg, grid=14)  # pretrained at 224/16 = 14
        params = load_vit_npz(npz, cfg, rng=jax.random.PRNGKey(0))
        assert params["embeddings"]["pos_embeddings"].shape == (24 * 24 + 1, 32)
        # CLS slot passes through unresized
        np.testing.assert_allclose(
            np.asarray(params["embeddings"]["pos_embeddings"][0]),
            npz["Transformer/posembed_input/pos_embedding"][0, 0])

    def test_forward_after_load(self):
        cfg = get_vit_config(num_keep_layers=2, hidden_size=32, mlp_dim=64,
                             num_heads=2, num_extra_tokens=2)
        params = load_vit_npz(make_fake_npz(cfg), cfg, rng=jax.random.PRNGKey(0))
        patches = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8, 16, 16, 3)),
                              jnp.float32)
        pos = jnp.full((1, 8, 2), 0.5, jnp.float32)
        out = vit_forward(params, cfg, patches, pos, compute_dtype=jnp.float32)
        assert np.isfinite(np.asarray(out)).all()


class TestReturnAttention:
    def test_attention_and_layers_returned(self):
        params = init_vit_params(jax.random.PRNGKey(0), SMALL_VIT)
        patches, pos = make_inputs(n=8)
        x, attn, layers = vit_forward(params, SMALL_VIT, patches, pos,
                                      compute_dtype=jnp.float32,
                                      pad_seq_to=None,
                                      return_attention=True, return_layers=True)
        s = SMALL_VIT.num_tokens + 8
        assert len(attn) == SMALL_VIT.effective_num_layers
        assert attn[0].shape == (2, SMALL_VIT.num_heads, s, s)
        # attention rows sum to 1
        np.testing.assert_allclose(np.asarray(attn[0].sum(-1)), 1.0, rtol=1e-5)
        assert len(layers) == SMALL_VIT.effective_num_layers
        # tokens_only slicing applied to layer states (reference
        # transformer.py:633-636)
        assert layers[0].shape == (2, SMALL_VIT.num_tokens, SMALL_VIT.hidden_size)

    def test_default_path_unchanged(self):
        params = init_vit_params(jax.random.PRNGKey(0), SMALL_VIT)
        patches, pos = make_inputs(n=8)
        out1 = vit_forward(params, SMALL_VIT, patches, pos, compute_dtype=jnp.float32)
        out2, _, _ = vit_forward(params, SMALL_VIT, patches, pos,
                                 compute_dtype=jnp.float32, return_attention=True)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   rtol=1e-5, atol=1e-6)


class TestL16Variant:
    def test_l16_structure_and_forward(self):
        """ViT-L/16 structural smoke: 1024 hidden, 16 heads; truncated to one
        layer for CPU speed."""
        cfg = get_vit_config(VIT_VARIANT_L16, num_keep_layers=1, num_extra_tokens=8)
        assert cfg.hidden_size == 1024 and cfg.num_heads == 16
        params = init_vit_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        patches = jnp.asarray(rng.normal(size=(1, 8, 16, 16, 3)), jnp.float32)
        pos = jnp.full((1, 8, 2), 0.25, jnp.float32)
        out = vit_forward(params, cfg, patches, pos, compute_dtype=jnp.float32)
        assert out.shape == (1, 9, 1024)
        assert np.isfinite(np.asarray(out)).all()

    def test_l16_npz_load(self):
        from test_models import make_fake_npz  # self-import ok in pytest
        cfg = get_vit_config(VIT_VARIANT_L16, num_keep_layers=1, hidden_size=64,
                             mlp_dim=128, num_heads=4)
        npz = make_fake_npz(cfg)
        params = load_vit_npz(npz, cfg, rng=jax.random.PRNGKey(0))
        assert params["embeddings"]["pos_embeddings"].shape == (577, 64)


class TestAdapters:
    """num_adapters>0 must engage adapter 0 in the forward graph by default
    (reference forward_vit auto-selects adapter 0, backbone.py:54-57)."""

    def _cfg(self, num_adapters):
        vit = get_vit_config(num_keep_layers=2, num_extra_tokens=8,
                             hidden_size=32, mlp_dim=64, num_heads=2,
                             num_adapters=num_adapters)
        return VTAMIQConfig(vit=vit, num_rgs=2, num_rcabs=2, ca_reduction=8)

    def test_adapter_changes_forward(self):
        cfg = self._cfg(1)
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        patches = jnp.asarray(rng.normal(size=(2, 2, 8, 16, 16, 3)), jnp.float32)
        pos = jnp.asarray(rng.uniform(0, 1, size=(2, 2, 8, 2)), jnp.float32)

        q_default = vtamiq_forward(params, cfg, patches, pos, compute_dtype=jnp.float32)
        q_off = vtamiq_forward(params, cfg, patches, pos, adapter_num=-1,
                               compute_dtype=jnp.float32)
        # freshly-initialized adapters are non-identity (random up/down)
        assert not np.allclose(np.asarray(q_default), np.asarray(q_off))

        # zero the adapter up-projections -> adapter becomes the identity,
        # so the DEFAULT forward must now equal the adapter-off forward
        # (proves adapter 0 is what makes them differ)
        params2 = jax.tree_util.tree_map(lambda x: x, params)
        for lname in params2["vit"]["encoder"]["layers"]:
            ad = params2["vit"]["encoder"]["layers"][lname]["adapters"]["adapter_0"]
            ad["attn"]["up"]["kernel"] = jnp.zeros_like(ad["attn"]["up"]["kernel"])
            ad["mlp"]["up"]["kernel"] = jnp.zeros_like(ad["mlp"]["up"]["kernel"])
            ad["attn"]["up"]["bias"] = jnp.zeros_like(ad["attn"]["up"]["bias"])
            ad["mlp"]["up"]["bias"] = jnp.zeros_like(ad["mlp"]["up"]["bias"])
        q_inert = vtamiq_forward(params2, cfg, patches, pos,
                                 compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(q_inert), np.asarray(q_off),
                                   rtol=1e-5, atol=1e-6)

    def test_adapters_receive_gradients(self):
        cfg = self._cfg(1)
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(1)
        patches = jnp.asarray(rng.normal(size=(2, 2, 8, 16, 16, 3)), jnp.float32)
        pos = jnp.asarray(rng.uniform(0, 1, size=(2, 2, 8, 2)), jnp.float32)

        def loss(p):
            return jnp.sum(vtamiq_forward(p, cfg, patches, pos,
                                          compute_dtype=jnp.float32) ** 2)

        grads = jax.grad(loss)(params)
        g = grads["vit"]["encoder"]["layers"]["layer_0"]["adapters"]["adapter_0"]
        total = sum(float(jnp.sum(jnp.abs(leaf)))
                    for leaf in jax.tree_util.tree_leaves(g))
        assert total > 0.0
