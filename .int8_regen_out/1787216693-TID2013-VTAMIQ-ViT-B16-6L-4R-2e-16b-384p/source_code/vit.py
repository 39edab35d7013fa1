"""Sparse-patch Vision Transformer, as functional JAX (param pytrees).

Capability parity with the reference's modified ViT
(modules/VisionTransformer/transformer.py:565-678 and submodules), redesigned
TPU-first:

- Patches arrive pre-cut as (B, N, P, P, 3); the patch embedding is a single
  ``(B*N, P*P*3) @ (P*P*3, H)`` matmul on the MXU instead of a Conv2d over
  B*N tiny images (reference Embeddings.forward, transformer.py:526-536).
- Parameters live in a nested dict pytree with kernels in (in, out) matmul
  layout — the native layout of the jax-format ``ViT-B_16.npz`` checkpoints,
  so loading needs no transposes (unlike the reference's np2th conversion,
  transformer.py:118-122,287-325).
- Token sequences are padded to a lane-friendly length with an attention mask
  so every (B, S, H) shape tiles cleanly onto the MXU.
- Compute runs in a configurable dtype (bf16 on TPU) with fp32 LayerNorm and
  softmax; parameters stay fp32.

Behavioral quirks preserved (SURVEY.md §7 parity traps):
- CLS also receives positional-embedding slot 0 (transformer.py:510-515).
- Extra "register" tokens receive neither pos nor scale embeddings
  (transformer.py:521-523).
- Encoder DropPath is constructed inert (prob 0.0) in the reference
  (transformer.py:272-273); controlled here by ``vit_path_drop_active``.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configs import ViTConfig, INIT_NORM_STD

NEG_INF = -1e9


# --------------------------------------------------------------------------
# initialization
# --------------------------------------------------------------------------

def _trunc_normal(key, shape, std=INIT_NORM_STD, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _linear_init(key, fan_in, fan_out, dtype=jnp.float32):
    """Xavier-uniform kernel + zero bias (reference init_weights_linear)."""
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    k = jax.random.uniform(key, (fan_in, fan_out), dtype, -limit, limit)
    return {"kernel": k, "bias": jnp.zeros((fan_out,), dtype)}


def _layer_norm_init(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_encoder_layer(key, cfg: ViTConfig) -> Dict:
    h, m = cfg.hidden_size, cfg.mlp_dim
    keys = jax.random.split(key, 8 + 2 * cfg.num_adapters)
    layer = {
        "attn": {
            "query": _linear_init(keys[0], h, h),
            "key": _linear_init(keys[1], h, h),
            "value": _linear_init(keys[2], h, h),
            "out": _linear_init(keys[3], h, h),
        },
        "mlp": {
            "fc1": _linear_init(keys[4], h, m),
            "fc2": _linear_init(keys[5], m, h),
        },
        "ln1": _layer_norm_init(h),
        "ln2": _layer_norm_init(h),
    }
    if cfg.use_layer_scale:
        # init 1.0: pretrained-transformer-friendly (transformer.py:235-243)
        layer["ls1"] = jnp.ones((h,), jnp.float32)
        layer["ls2"] = jnp.ones((h,), jnp.float32)
    if cfg.num_adapters > 0:
        adapters = {}
        ah = h // 4  # Houlsby adapter reduction=4 (transformer.py:177-187)
        for a in range(cfg.num_adapters):
            k1, k2, k3, k4 = jax.random.split(keys[6 + a], 4)
            adapters[f"adapter_{a}"] = {
                "attn": {"down": _linear_init(k1, h, ah), "up": _linear_init(k2, ah, h)},
                "mlp": {"down": _linear_init(k3, h, ah), "up": _linear_init(k4, ah, h)},
            }
        layer["adapters"] = adapters
    return layer


def init_vit_params(key, cfg: ViTConfig) -> Dict:
    h = cfg.hidden_size
    p = cfg.patch_size
    n_pos = cfg.pos_grid ** 2 + 1
    keys = jax.random.split(key, 8 + cfg.effective_num_layers)

    emb = {}
    if cfg.use_patch_embedding:
        emb["patch"] = _linear_init(keys[0], p * p * 3, h)
    if cfg.use_cls_token:
        emb["cls_token"] = _trunc_normal(keys[1], (h,))
    if cfg.num_extra_tokens > 0:
        emb["extra_tokens"] = _trunc_normal(keys[2], (cfg.num_extra_tokens, h))
    if cfg.use_pos_embedding:
        emb["pos_embeddings"] = _trunc_normal(keys[3], (n_pos, h))
    if cfg.use_scale_embedding:
        emb["scale_embeddings"] = _trunc_normal(keys[4], (cfg.num_scales + 1, h))

    layers = {
        f"layer_{i}": init_encoder_layer(keys[8 + i], cfg)
        for i in range(cfg.effective_num_layers)
    }
    return {
        "embeddings": emb,
        "encoder": {"layers": layers, "final_ln": _layer_norm_init(h)},
    }


# --------------------------------------------------------------------------
# building blocks
# --------------------------------------------------------------------------

def rms_norm(weight, x, eps: float = 1e-6):
    """Llama-style RMSNorm (reference carries an unused implementation at
    transformer.py:219-230; provided for architecture experiments)."""
    orig_dtype = x.dtype
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * weight.astype(jnp.float32)).astype(orig_dtype)


def layer_norm(params, x, eps: float = 1e-6):
    """LayerNorm in fp32 regardless of compute dtype."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def resolve_dtypes(compute_dtype):
    """Resolve a compute policy into (stream_dtype, mm_dtype).

    ``compute_dtype`` is a jnp dtype (bf16/fp32: residual stream and matmul
    inputs share it; mm_dtype None = follow the stream) or the string
    ``"mixed"``: fp32 residual stream/activations with bf16 matmul inputs.
    Mixed keeps the MXU on bf16 (the FLOPs) while the stream accumulates in
    fp32 — adjudicated by the round-5 collapse diagnosis
    (tools/diag_collapse.py): from-scratch multiscale training at the
    reference's run_multi protocol collapses 2/5 seeds under a bf16 stream
    and tracks the fp32 torch reference near-exactly with an fp32 stream.
    """
    if isinstance(compute_dtype, str) and compute_dtype == "mixed":
        return jnp.float32, jnp.bfloat16
    return compute_dtype, None


def dense(params, x, dtype=None, out_dtype=None):
    """y = x @ kernel + bias. ``dtype``: matmul input dtype (kernel and x are
    cast to it; default x.dtype); accumulation is always fp32 on the MXU.
    ``out_dtype``: result dtype (default = ``dtype``) — lets a bf16 matmul
    feed an fp32 residual stream (mixed policy)."""
    if "kernel_q8" in params:
        # leaf was rewritten by ops.quant.quantize_params_int8 (serving-only
        # W8A8 path); dispatch resolves at trace time — zero cost otherwise
        from vtamiq_tpu.ops.quant import dense_q8
        return dense_q8(params, x, out_dtype or dtype)
    dtype = dtype or x.dtype
    out_dtype = out_dtype or dtype
    return (jnp.dot(x.astype(dtype), params["kernel"].astype(dtype),
                    preferred_element_type=jnp.float32).astype(out_dtype)
            + params["bias"].astype(out_dtype))


def mhsa(params, x, num_heads: int, mask: Optional[jnp.ndarray] = None,
         attention_fn=None, return_attention: bool = False,
         logits_fp32: bool = False, q_len: Optional[int] = None,
         mm_dtype=None):
    """Multi-head self-attention (reference: transformer.py:125-172).

    x: (B, S, H); mask: optional (B, S) bool of valid key positions.
    Returns (out, probs) — probs is the (B, heads, S, S) attention matrix
    when ``return_attention`` (reference return_attention knob), else None.
    Attention maps are only materialized on the full-softmax path (the flash
    kernel never forms them — that is its point).

    The (B, heads, S, S) logits tensor is the dominant HBM traffic of the
    short-sequence forward; it is stored in the compute dtype (the softmax
    still reduces in fp32 inside the fusion). Measured +10% end-to-end on
    v5e at 500 patches (docs/OPERATIONS.md attention table). ``logits_fp32``
    (ViTConfig.attn_logits_fp32) restores fp32 logits storage; fp32 compute
    always uses fp32 logits, so golden parity vs the torch reference is
    unaffected.

    ``q_len``: restrict QUERIES to the first q_len tokens (keys/values stay
    full) — output (B, q_len, H). Used by the final encoder layer when only
    the leading CLS/register tokens survive (vit_forward tokens_only): the
    discarded tokens' outputs are never computed. Exact — the kept tokens'
    math is unchanged.
    """
    b, s, h = x.shape
    d = h // num_heads
    dtype = x.dtype              # residual-stream dtype
    mm = mm_dtype or dtype       # matmul-input dtype (bf16 under "mixed")

    xq = x if q_len is None else x[:, :q_len]
    q = dense(params["query"], xq, mm).reshape(b, xq.shape[1], num_heads, d)
    k = dense(params["key"], x, mm).reshape(b, s, num_heads, d)
    v = dense(params["value"], x, mm).reshape(b, s, num_heads, d)

    probs_out = None
    if attention_fn is not None and not return_attention and q_len is None:
        ctx = attention_fn(q, k, v, mask)
    else:
        logits_dtype = jnp.float32 if (logits_fp32 or dtype == jnp.float32) else mm
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=logits_dtype) / math.sqrt(d)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :],
                               logits, jnp.asarray(NEG_INF, logits.dtype))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(mm)
        if return_attention:
            probs_out = probs
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(mm)

    ctx = ctx.reshape(b, xq.shape[1], h)
    return dense(params["out"], ctx, mm, out_dtype=dtype), probs_out


def mlp_block(params, x, mm_dtype=None):
    y = jax.nn.gelu(dense(params["fc1"], x, mm_dtype), approximate=False)
    return dense(params["fc2"], y, mm_dtype, out_dtype=x.dtype)


def adapter_block(params, x, mm_dtype=None):
    """Houlsby adapter: x + up(gelu(down(x))) (transformer.py:177-194)."""
    y = jax.nn.gelu(dense(params["down"], x, mm_dtype), approximate=False)
    return x + dense(params["up"], y, mm_dtype, out_dtype=x.dtype)


def drop_path(key, x, prob: float):
    """Per-sample stochastic depth with 1/keep rescale (timm semantics)."""
    if prob <= 0.0:
        return x
    keep = 1.0 - prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def encoder_layer(params, x, cfg: ViTConfig, mask=None, adapter_num: int = -1,
                  train: bool = False, rng: Optional[jax.Array] = None,
                  attention_fn=None, return_attention: bool = False,
                  q_len: Optional[int] = None, mm_dtype=None):
    """Pre-LN block: x += DP(LS1(MHSA(LN(x)))); x += DP(LS2(MLP(LN(x))))
    (reference: transformer.py:275-285). Returns (x, attn_probs | None).

    ``q_len``: compute the block's output only for the first q_len tokens
    (final-layer token-slice pushdown; see mhsa). The residual stream and
    MLP shrink to (B, q_len, H); exact for the kept tokens."""
    use_adapter = cfg.num_adapters > 0 and adapter_num >= 0
    adapter = params.get("adapters", {}).get(f"adapter_{adapter_num}") if use_adapter else None

    dp_prob = cfg.path_drop_prob if (train and cfg.vit_path_drop_active) else 0.0
    if dp_prob > 0.0 and rng is not None:
        rng1, rng2 = jax.random.split(rng)
    else:
        rng1 = rng2 = None

    h, attn_probs = mhsa(params["attn"], layer_norm(params["ln1"], x),
                         cfg.num_heads, mask=mask, attention_fn=attention_fn,
                         return_attention=return_attention,
                         logits_fp32=cfg.attn_logits_fp32, q_len=q_len,
                         mm_dtype=mm_dtype)
    if adapter is not None:
        h = adapter_block(adapter["attn"], h, mm_dtype)
    if cfg.use_layer_scale:
        h = h * params["ls1"].astype(h.dtype)
    if rng1 is not None:
        h = drop_path(rng1, h, dp_prob)
    x = (x if q_len is None else x[:, :q_len]) + h

    h = mlp_block(params["mlp"], layer_norm(params["ln2"], x), mm_dtype)
    if adapter is not None:
        h = adapter_block(adapter["mlp"], h, mm_dtype)
    if cfg.use_layer_scale:
        h = h * params["ls2"].astype(h.dtype)
    if rng2 is not None:
        h = drop_path(rng2, h, dp_prob)
    return x + h, attn_probs


# --------------------------------------------------------------------------
# embeddings
# --------------------------------------------------------------------------

def uv_pos_lookup(pos_table: jnp.ndarray, pos: jnp.ndarray, grid: int) -> jnp.ndarray:
    """uv in [0,1)^2 -> learned positional embedding.

    index = floor(u*grid)*grid + floor(v*grid) + 1 (+1 skips the CLS slot);
    reference UvPosEmbedding.forward (transformer.py:417-423).
    pos: (..., 2) -> (..., H).
    """
    q = jnp.floor(pos * grid).astype(jnp.int32)
    q = jnp.clip(q, 0, grid - 1)
    idx = q[..., 0] * grid + q[..., 1] + 1
    return pos_table[idx]


def scale_lookup(scale_table: jnp.ndarray, scales: jnp.ndarray, num_scales: int) -> jnp.ndarray:
    """Scale index -> embedding; clamp to [0, num_scales-1] then +1 offset
    (reference ScaleEmbedding.forward, transformer.py:396-400)."""
    idx = jnp.clip(scales, 0, num_scales - 1).astype(jnp.int32) + 1
    return scale_table[idx]


def embed_patches(params, cfg: ViTConfig, patches, pos, scales=None,
                  compute_dtype=jnp.float32, pre_embedded: bool = False):
    """(B, N, P, P, 3) or pre-flattened (B, N, P*P*3) pixel patches
    [or, with ``pre_embedded=True``, (B, N, H) features]
    -> (B, T + N, H) token sequence (reference Embeddings.forward,
    transformer.py:526-562).

    NOTE: pre-embedded inputs need the explicit flag — for B/16 the flat
    pixel size P*P*3 == hidden_size == 768, so shapes cannot disambiguate.
    """
    emb = params["embeddings"]
    b, n = patches.shape[0], patches.shape[1]
    stream, mm = resolve_dtypes(compute_dtype)
    compute_dtype = stream

    x = patches.reshape(b, n, -1).astype(mm or stream)
    if cfg.use_patch_embedding and not pre_embedded:
        x = dense(emb["patch"], x, mm, out_dtype=stream)
    else:
        x = x.astype(stream)

    if cfg.use_pos_embedding:
        x = x + uv_pos_lookup(emb["pos_embeddings"], pos, cfg.pos_grid).astype(compute_dtype)

    if cfg.use_scale_embedding:
        if scales is None:
            raise ValueError("ViT uses scale embeddings but scales is None.")
        x = x + scale_lookup(emb["scale_embeddings"], scales, cfg.num_scales).astype(compute_dtype)

    tokens = []
    if cfg.use_cls_token:
        cls = emb["cls_token"]
        if cfg.use_pos_embedding:
            cls = cls + emb["pos_embeddings"][0]  # CLS gets pos slot 0 (quirk)
        tokens.append(jnp.broadcast_to(cls.astype(compute_dtype), (b, 1, cfg.hidden_size)))
    if cfg.num_extra_tokens > 0:
        tokens.append(jnp.broadcast_to(emb["extra_tokens"].astype(compute_dtype),
                                       (b, cfg.num_extra_tokens, cfg.hidden_size)))
    if tokens:
        x = jnp.concatenate(tokens + [x], axis=1)
    return x


# --------------------------------------------------------------------------
# full forward
# --------------------------------------------------------------------------

def pad_to_multiple(seq_len: int, multiple: int = 128) -> int:
    return ((seq_len + multiple - 1) // multiple) * multiple


def vit_forward(params, cfg: ViTConfig, patches, pos, scales=None, *,
                tokens_only: bool = True, adapter_num: int = -1,
                train: bool = False, rng: Optional[jax.Array] = None,
                patch_mask: Optional[jnp.ndarray] = None,
                compute_dtype=jnp.bfloat16, pad_seq_to: Optional[int] = 128,
                attention_fn=None, pre_embedded: bool = False,
                return_attention: bool = False, return_layers: bool = False):
    """Full ViT forward over a sparse patch sequence.

    Args:
      patches: (B, N, P, P, 3) pixel patches (or pre-embedded (B, N, H)).
      pos: (B, N, 2) uv centers in [0,1).
      scales: optional (B, N) int scale indices.
      patch_mask: optional (B, N) bool; False = padded patch (excluded from
        attention). CLS/extra tokens are always valid.
      pad_seq_to: pad the token sequence to a multiple of this for MXU/VPU
        lane alignment (None disables).
      return_attention / return_layers: also return per-layer attention
        probabilities / hidden states (reference Encoder.forward,
        transformer.py:363-378); intended for visualization/analysis, not the
        train path.

    Returns (B, num_tokens, H) when tokens_only else (B, S, H) fp32; with
    return_attention or return_layers, returns (x, attn_list, layers_list).
    """
    b, n = patches.shape[0], patches.shape[1]
    t = cfg.num_tokens
    stream_dtype, mm_dtype = resolve_dtypes(compute_dtype)
    x = embed_patches(params, cfg, patches, pos, scales, compute_dtype,
                      pre_embedded=pre_embedded)

    mask = None
    if patch_mask is not None:
        mask = jnp.concatenate(
            [jnp.ones((b, t), bool), patch_mask.astype(bool)], axis=1)

    if pad_seq_to is not None:
        s = x.shape[1]
        s_pad = pad_to_multiple(s, pad_seq_to)
        if s_pad != s:
            x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)))
            if mask is None:
                mask = jnp.concatenate(
                    [jnp.ones((b, s), bool), jnp.zeros((b, s_pad - s), bool)], axis=1)
            else:
                mask = jnp.pad(mask, ((0, 0), (0, s_pad - s)))

    layers = params["encoder"]["layers"]

    # token-slice pushdown: with tokens_only, the LAST layer computes
    # queries/MLP only for the first t tokens (everything after them is
    # discarded by the slice below anyway) — exact, and saves the last
    # layer's (S - t)-token MLP + logits traffic (~12% of forward FLOPs at
    # 500 patches). Disabled for the introspection paths, which need full
    # per-layer states.
    slice_last = tokens_only and not (return_attention or return_layers)

    def run_layer(layer_params, x, layer_rng, q_len=None):
        return encoder_layer(layer_params, x, cfg, mask=mask,
                             adapter_num=adapter_num, train=train,
                             rng=layer_rng, attention_fn=attention_fn,
                             return_attention=return_attention, q_len=q_len,
                             mm_dtype=mm_dtype)

    if cfg.remat:
        run_layer = jax.checkpoint(run_layer, static_argnums=(3,))

    attn_weights = []
    layer_states = []
    for i in range(cfg.effective_num_layers):
        layer_rng = None
        if rng is not None:
            rng, layer_rng = jax.random.split(rng)
        last = i == cfg.effective_num_layers - 1
        x, attn_probs = run_layer(layers[f"layer_{i}"], x, layer_rng,
                                  t if (slice_last and last) else None)
        if return_attention:
            attn_weights.append(attn_probs)
        if return_layers:
            layer_states.append(x)

    x = layer_norm(params["encoder"]["final_ln"], x)
    x = x.astype(jnp.float32)
    if tokens_only:
        x = x[:, :t]
        if return_layers:
            layer_states = [ls[:, :t] for ls in layer_states]
    if return_attention or return_layers:
        return x, attn_weights, layer_states
    return x


# --------------------------------------------------------------------------
# npz checkpoint loading (jax-format ViT weights)
# --------------------------------------------------------------------------

def load_vit_npz(npz, cfg: ViTConfig, params: Optional[Dict] = None,
                 rng: Optional[jax.Array] = None) -> Dict:
    """Load jax-format ImageNet ViT weights (the same ``ViT-B_16.npz`` files
    the reference consumes, transformer.py:643-668) into our param pytree.

    The npz layout is already (in, out) jax convention — no transposes needed
    (the reference's np2th/.t() calls exist to convert INTO torch layout).
    Positional-embedding grids of a different size are bilinearly zoomed
    (reference UvPosEmbedding.load_from, transformer.py:428-455).

    ``npz`` is a mapping (np.load result or dict). Missing optional keys keep
    their initialized values from ``params`` (or a fresh init).
    """
    if params is None:
        params = init_vit_params(rng if rng is not None else jax.random.PRNGKey(0), cfg)
    h = cfg.hidden_size
    emb = params["embeddings"]

    def a(name):
        return jnp.asarray(np.asarray(npz[name]), jnp.float32)

    if cfg.use_patch_embedding and "embedding/kernel" in npz:
        # HWIO (P, P, 3, H) -> (P*P*3, H); matches our (h, w, c) patch flatten
        emb["patch"]["kernel"] = a("embedding/kernel").reshape(-1, h)
        emb["patch"]["bias"] = a("embedding/bias").reshape(-1)

    if cfg.use_cls_token and "cls" in npz:
        emb["cls_token"] = a("cls").reshape(-1)

    if cfg.use_pos_embedding and "Transformer/posembed_input/pos_embedding" in npz:
        posemb = np.asarray(npz["Transformer/posembed_input/pos_embedding"], np.float32)
        posemb = posemb.reshape(posemb.shape[-2], posemb.shape[-1])  # (1+G*G, H)
        n_target = cfg.pos_grid ** 2 + 1
        if posemb.shape[0] != n_target:
            tok, grid_flat = posemb[:1], posemb[1:]
            gs_old = int(math.sqrt(grid_flat.shape[0]))
            gs_new = cfg.pos_grid
            grid = grid_flat.reshape(gs_old, gs_old, -1)
            grid = np.asarray(jax.image.resize(
                jnp.asarray(grid), (gs_new, gs_new, grid.shape[-1]), method="bilinear"))
            posemb = np.concatenate([tok, grid.reshape(gs_new * gs_new, -1)], axis=0)
        emb["pos_embeddings"] = jnp.asarray(posemb)

    enc = params["encoder"]
    if "Transformer/encoder_norm/scale" in npz:
        enc["final_ln"]["scale"] = a("Transformer/encoder_norm/scale").reshape(-1)
        enc["final_ln"]["bias"] = a("Transformer/encoder_norm/bias").reshape(-1)

    for i in range(cfg.effective_num_layers):
        root = f"Transformer/encoderblock_{i}"
        if f"{root}/LayerNorm_0/scale" not in npz:
            continue
        layer = enc["layers"][f"layer_{i}"]
        attn = "MultiHeadDotProductAttention_1"
        for ours, theirs in (("query", "query"), ("key", "key"),
                             ("value", "value"), ("out", "out")):
            kern = a(f"{root}/{attn}/{theirs}/kernel")
            bias = a(f"{root}/{attn}/{theirs}/bias")
            if ours == "out":
                layer["attn"]["out"]["kernel"] = kern.reshape(h, h)  # (heads, d, H)
            else:
                layer["attn"][ours]["kernel"] = kern.reshape(h, h)  # (H, heads, d)
            layer["attn"][ours]["bias"] = bias.reshape(-1)
        layer["mlp"]["fc1"]["kernel"] = a(f"{root}/MlpBlock_3/Dense_0/kernel")
        layer["mlp"]["fc1"]["bias"] = a(f"{root}/MlpBlock_3/Dense_0/bias").reshape(-1)
        layer["mlp"]["fc2"]["kernel"] = a(f"{root}/MlpBlock_3/Dense_1/kernel")
        layer["mlp"]["fc2"]["bias"] = a(f"{root}/MlpBlock_3/Dense_1/bias").reshape(-1)
        layer["ln1"]["scale"] = a(f"{root}/LayerNorm_0/scale").reshape(-1)
        layer["ln1"]["bias"] = a(f"{root}/LayerNorm_0/bias").reshape(-1)
        layer["ln2"]["scale"] = a(f"{root}/LayerNorm_2/scale").reshape(-1)
        layer["ln2"]["bias"] = a(f"{root}/LayerNorm_2/bias").reshape(-1)

    return params
