"""Fused (flash-style) attention for long patch sequences.

The reference computes full quadratic attention (transformer.py:158-164),
which is fine at its 9+384..1024 token sequences but impossible for the
5000-patch PIPAL config (BASELINE.json config #5): at S=5009+9 tokens and
batch 16x2 towers the logits tensor alone is ~20 GB. This module provides:

- ``flash_attention``: a Pallas TPU kernel computing softmax(QK^T/sqrt(d))V
  with online (streaming) softmax — O(S) memory, MXU-tiled blocks, fp32
  accumulators — plus a memory-efficient custom VJP that recomputes
  attention blockwise on the backward pass (flash-backward), so the
  5000-patch config trains within HBM.
- ``blockwise_attention``: a pure-XLA lax.scan fallback with identical
  semantics (used on CPU/interpret tests and as the VJP building block).

Both support key-validity masks for padded patch sequences.

Layout: q, k, v are (B, S, H, D) — batch, sequence, heads, head_dim — the
layout produced by vit.mhsa.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024  # 5120-token sweep: +30% over (256, 512) — the
# per-program (BQ, D)x(D, BK) matmuls have K=D=64, so bigger tiles amortize
# the online-softmax bookkeeping (tools/profile_experiments10.py); larger
# still OOMs scoped VMEM or loses it again

# patch counts past this use flash attention (below it, XLA's fused full
# attention is faster and the quadratic logits easily fit)
FLASH_ATTENTION_THRESHOLD = 2048


# --------------------------------------------------------------------------
# pure-XLA blockwise attention (reference semantics; O(S * BK) memory)
# --------------------------------------------------------------------------

def blockwise_attention(q, k, v, mask: Optional[jnp.ndarray] = None,
                        block_k: int = DEFAULT_BLOCK_K):
    """Online-softmax attention via lax.scan over key blocks.

    q, k, v: (B, S, H, D); mask: optional (B, S) key-validity bool.
    Returns (B, S, H, D) in q.dtype.
    """
    b, s, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    orig_dtype = q.dtype

    if s % block_k != 0:
        pad = block_k - s % block_k
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        kmask = jnp.concatenate([
            jnp.ones((b, s), bool) if mask is None else mask.astype(bool),
            jnp.zeros((b, pad), bool)], axis=1)
    else:
        kmask = mask.astype(bool) if mask is not None else jnp.ones((b, s), bool)

    sk = k.shape[1]
    nk = sk // block_k
    k_blocks = k.reshape(b, nk, block_k, h, d).transpose(1, 0, 2, 3, 4)
    v_blocks = v.reshape(b, nk, block_k, h, d).transpose(1, 0, 2, 3, 4)
    m_blocks = kmask.reshape(b, nk, block_k).transpose(1, 0, 2)

    # the scan body is rematerialized: without it, differentiating the scan
    # stores the (B, H, S, BK) prob block of EVERY step — ~5 GB at the
    # 5000-patch config — and training OOMs. Recomputing each block in the
    # backward pass is the flash-backward memory/compute trade.
    @jax.checkpoint
    def body(carry, blk):
        acc, m_run, l_run = carry
        kb, vb, mb = blk  # (B, BK, H, D), (B, BK)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kb,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mb[:, None, None, :], logits, NEG_INF)
        m_new = jnp.maximum(m_run, logits.max(axis=-1))          # (B, H, S)
        p = jnp.exp(logits - m_new[..., None])                    # (B, H, S, BK)
        correction = jnp.exp(m_run - m_new)
        l_new = l_run * correction + p.sum(axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(orig_dtype), vb,
                        preferred_element_type=jnp.float32)
        acc = acc * correction.transpose(0, 2, 1)[..., None] + pv
        return (acc, m_new, l_new), None

    acc0 = jnp.zeros((b, s, h, d), jnp.float32)
    m0 = jnp.full((b, h, s), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s), jnp.float32)
    (acc, m_run, l_run), _ = jax.lax.scan(body, (acc0, m0, l0),
                                          (k_blocks, v_blocks, m_blocks))
    out = acc / jnp.maximum(l_run, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(orig_dtype)


# --------------------------------------------------------------------------
# Pallas flash-attention forward kernel
# --------------------------------------------------------------------------

def _flash_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref,
                      m_scratch, l_scratch, acc_scratch, *, scale, nk):
    """Grid (B, H, nQ, nK); the trailing (sequential) nK axis streams key
    blocks through the online softmax held in VMEM scratch."""
    k_idx = pl.program_id(3)

    @pl.when(k_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    q = q_ref[0, 0]                                # (BQ, D)
    k = k_ref[0, 0]                                # (BK, D)
    v = v_ref[0, 0]                                # (BK, D)
    kmask = mask_ref[0, 0] != 0                    # (BK,)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale  # (BQ, BK)
    logits = jnp.where(kmask[None, :], logits, NEG_INF)

    m_prev = m_scratch[...]                        # (BQ, 1)
    l_prev = l_scratch[...]
    m_cur = jnp.max(logits, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(logits - m_new)                    # (BQ, BK)
    correction = jnp.exp(m_prev - m_new)           # (BQ, 1)
    l_new = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)

    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BQ, D)
    acc_scratch[...] = acc_scratch[...] * correction + pv
    m_scratch[...] = m_new
    l_scratch[...] = l_new

    @pl.when(k_idx == nk - 1)
    def _finalize():
        l = jnp.maximum(l_scratch[...], 1e-30)
        o_ref[0, 0] = (acc_scratch[...] / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, mask, block_q, block_k):
    """(B, H, S, D) inputs -> out (B, H, S, D)."""
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    nq = s // block_q
    nk = s // block_k

    kernel = functools.partial(_flash_fwd_kernel, scale=scale, nk=nk)
    grid = (b, h, nq, nk)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d),
                               lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q, k, v, mask.astype(jnp.int32)[:, None, :])
    return out


# --------------------------------------------------------------------------
# custom VJP: pallas forward, blockwise-recompute backward
# --------------------------------------------------------------------------

def _attn_padded(q, k, v, mask, block_q, block_k, use_pallas):
    """Pad S to lcm-friendly multiples and dispatch. q,k,v (B, S, H, D)."""
    b, s, h, d = q.shape
    blk = max(block_q, block_k)
    s_pad = ((s + blk - 1) // blk) * blk
    pad = s_pad - s
    if mask is None:
        mask = jnp.ones((b, s), bool)
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        mask = jnp.pad(mask.astype(bool), ((0, 0), (0, pad)))

    if use_pallas:
        qt = q.transpose(0, 2, 1, 3)  # (B, H, S, D)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out = _flash_forward(qt, kt, vt, mask, block_q, block_k)
        out = out.transpose(0, 2, 1, 3)
    else:
        out = blockwise_attention(q, k, v, mask, block_k=block_k)
    return out[:, :s] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_impl(q, k, v, block_q, block_k, use_pallas, mask):
    return _attn_padded(q, k, v, mask, block_q, block_k, use_pallas)


def _flash_fwd_rule(q, k, v, block_q, block_k, use_pallas, mask):
    out = _attn_padded(q, k, v, mask, block_q, block_k, use_pallas)
    return out, (q, k, v, mask)


def _flash_bwd_rule(block_q, block_k, use_pallas, residuals, g):
    """Memory-efficient backward: recompute attention blockwise under
    remat; XLA differentiates the O(S*BK)-memory scan."""
    q, k, v, mask = residuals

    def f(q, k, v):
        return blockwise_attention(q, k, v, mask, block_k=block_k)

    _, vjp = jax.vjp(jax.checkpoint(f), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_impl.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q, k, v, mask: Optional[jnp.ndarray] = None, *,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    use_pallas: Optional[bool] = None):
    """Flash attention over (B, S, H, D) tensors with optional (B, S) key mask.

    ``use_pallas=None`` auto-selects: the Pallas kernel on TPU, the XLA
    blockwise scan elsewhere (CPU tests, interpret mode).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    return _flash_attention_impl(q, k, v, block_q, block_k, use_pallas, mask)


def make_attention_fn(threshold: int = 2048, block_q: int = DEFAULT_BLOCK_Q,
                      block_k: int = DEFAULT_BLOCK_K):
    """attention_fn for vit.mhsa: flash attention for sequences past the
    threshold, plain XLA attention below it (small-S full attention is faster
    and XLA fuses it well)."""

    def attention_fn(q, k, v, mask):
        s = q.shape[1]
        if s < threshold:
            d = q.shape[-1]
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32) / math.sqrt(d)
            if mask is not None:
                logits = jnp.where(mask[:, None, None, :], logits, NEG_INF)
            probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                              preferred_element_type=jnp.float32).astype(q.dtype)
        return flash_attention(q, k, v, mask, block_q=block_q, block_k=block_k)

    return attention_fn
