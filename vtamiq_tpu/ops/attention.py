"""Fused (flash-style) attention for long patch sequences.

The reference computes full quadratic attention (transformer.py:158-164),
which is fine at its 9+384..1024 token sequences but impossible for the
5000-patch PIPAL config (BASELINE.json config #5): at S=5009+9 tokens and
batch 16x2 towers the logits tensor alone is ~20 GB. This module provides:

- ``flash_attention``: a Pallas TPU kernel computing softmax(QK^T/sqrt(d))V
  with online (streaming) softmax — O(S) memory, MXU-tiled blocks, fp32
  accumulators. Its custom VJP runs FlashAttention-2-style Pallas backward
  kernels (dq + fused dk/dv) over the saved per-query logsumexp — no
  forward recompute, no (S, S) tensor — so the 5000-patch config trains
  within HBM at ~2.5x forward cost instead of the recompute scan's ~7x.
- ``blockwise_attention``: a pure-XLA lax.scan fallback with identical
  semantics (used on CPU/interpret tests; its remat-recompute VJP is the
  backward fallback off-TPU).

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
# the online-softmax bookkeeping (`tools/profiler.py attention --sweep`,
# findings in docs/OPERATIONS.md); larger
# still OOMs scoped VMEM or loses it again

# backward kernels tile independently (they hold ~3x the forward's VMEM per
# program: q/k/v/do tiles + two fp32 (BQ, BK) intermediates + dk/dv scratch).
# Tuned via `tools/profiler.py tune5000` on v5e at (B=4, S=5120, H=12, D=64)
# bf16: (1024, 1024) 61.4 ms/grad vs inherited-(512, 1024) 63.0 — the sweep
# also showed the fused 5000p train step prefers NO encoder remat once the
# backward is kernel-based (5.92 vs 4.68 pairs/s at batch 4).
DEFAULT_BWD_BLOCK_Q = 1024
DEFAULT_BWD_BLOCK_K = 1024

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

def _flash_fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
                      m_scratch, l_scratch, acc_scratch, *, scale, nk):
    """Grid (B, H, nQ, nK); the trailing (sequential) nK axis streams key
    blocks through the online softmax held in VMEM scratch. Emits the
    per-query logsumexp for the flash-backward kernels."""
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
        lse_ref[0, 0] = m_scratch[...] + jnp.log(l)


def _flash_forward(q, k, v, mask, block_q, block_k):
    """(B, H, S, D) inputs -> (out (B, H, S, D), lse (B, H, S, 1) fp32).

    lse carries a trailing singleton axis so its blocks are (BQ, 1) tiles —
    Mosaic requires the last two block dims be (8-divisible, 128-divisible)
    OR equal to the array dims; (…, BQ, 1) satisfies that where a 3-D
    (1, 1, BQ) block does not."""
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    nq = s // block_q
    nk = s // block_k

    kernel = functools.partial(_flash_fwd_kernel, scale=scale, nk=nk)
    grid = (b, h, nq, nk)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, block_q, 1),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
    )(q, k, v, mask.astype(jnp.int32)[:, None, :])
    return out, lse


# --------------------------------------------------------------------------
# Pallas flash-attention backward kernels (FlashAttention-2 style)
# --------------------------------------------------------------------------
#
# Residuals: out + per-query logsumexp from the forward. Precompute
# delta_i = sum_d dO_i O_i (XLA, elementwise). Then
#   p_ij  = exp(q_i k_j / sqrt(d) - lse_i)
#   ds_ij = p_ij (dP_ij - delta_i) / sqrt(d),  dP = dO V^T
#   dq_i  = sum_j ds_ij k_j     (dq kernel: grid over q blocks, scan k)
#   dk_j  = sum_i ds_ij q_i     (dkv kernel: grid over k blocks, scan q)
#   dv_j  = sum_i p_ij dO_i
# No (S, S) tensor ever materializes; each kernel holds one (BQ, BK) tile.
# Replaces the XLA blockwise-recompute VJP (round-2 VERDICT #4): the
# recompute scan re-ran the full forward inside the backward AND
# differentiated it, ~7x fwd cost at 5000 patches; this is ~2.5x.

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         mask_ref, dq_ref, acc, *, scale, nk):
    k_idx = pl.program_id(3)

    @pl.when(k_idx == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[0, 0]                                # (BQ, D)
    k = k_ref[0, 0]                                # (BK, D)
    v = v_ref[0, 0]                                # (BK, D)
    do = do_ref[0, 0]                              # (BQ, D)
    lse = lse_ref[0, 0]                            # (BQ, 1)
    delta = delta_ref[0, 0]                        # (BQ, 1)
    kmask = mask_ref[0, 0] != 0                    # (BK,)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kmask[None, :], logits, NEG_INF)
    p = jnp.exp(logits - lse)                      # (BQ, BK) fp32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BQ, BK)
    ds = (p * (dp - delta) * scale).astype(k.dtype)
    acc[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BQ, D)

    @pl.when(k_idx == nk - 1)
    def _finalize():
        dq_ref[0, 0] = acc[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          mask_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                          scale, nq):
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]                                # (BQ, D)
    k = k_ref[0, 0]                                # (BK, D)
    v = v_ref[0, 0]                                # (BK, D)
    do = do_ref[0, 0]                              # (BQ, D)
    lse = lse_ref[0, 0]                            # (BQ, 1)
    delta = delta_ref[0, 0]                        # (BQ, 1)
    kmask = mask_ref[0, 0] != 0                    # (BK,)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kmask[None, :], logits, NEG_INF)
    p = jnp.exp(logits - lse)                      # (BQ, BK) fp32
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BK, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BQ, BK)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BK, D)

    @pl.when(q_idx == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                            mask_ref, dq_part_ref, dk_ref, dv_ref,
                            dk_acc, dv_acc, *, scale, nq):
    """Single-pass backward: grid (B, H, nK, nQ) with the q axis innermost.

    Per (k-block, q-block) tile this computes the minimal FIVE matmuls
    (logits, dP, dV, dK, dQ) where the split dq/dkv kernels compute seven
    (each recomputes logits and dP) — a ~2/7 cut of backward matmul FLOPs
    plus one fewer pass over q/k/v/do in HBM. dk/dv accumulate in VMEM
    scratch across the sequential q axis; dq cannot (its block changes every
    inner step and is revisited per k-block), so each tile's complete dq
    contribution is written to a per-k-block fp32 partial, summed by XLA
    outside the kernel — the same accumulation pattern as the public
    splash-attention fused backward."""
    q_idx = pl.program_id(3)

    @pl.when(q_idx == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0]                                # (BQ, D)
    k = k_ref[0, 0]                                # (BK, D)
    v = v_ref[0, 0]                                # (BK, D)
    do = do_ref[0, 0]                              # (BQ, D)
    lse = lse_ref[0, 0]                            # (BQ, 1)
    delta = delta_ref[0, 0]                        # (BQ, 1)
    kmask = mask_ref[0, 0] != 0                    # (BK,)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kmask[None, :], logits, NEG_INF)
    p = jnp.exp(logits - lse)                      # (BQ, BK) fp32
    dv_acc[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BK, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BQ, BK)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BK, D)
    dq_part_ref[0, 0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)         # (BQ, D) fp32 partial

    @pl.when(q_idx == nq - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_backward_fused(q, k, v, do, lse, delta, mask_i, block_q, block_k):
    """Fused-kernel driver: one pallas_call -> (dq, dk, dv)."""
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    nq = s // block_q
    nk = s // block_k

    q_spec = pl.BlockSpec((1, 1, block_q, d),
                          lambda bi, hi, ki, qi: (bi, hi, qi, 0))
    k_spec = pl.BlockSpec((1, 1, block_k, d),
                          lambda bi, hi, ki, qi: (bi, hi, ki, 0))
    r_spec = pl.BlockSpec((1, 1, block_q, 1),
                          lambda bi, hi, ki, qi: (bi, hi, qi, 0))
    m_spec = pl.BlockSpec((1, 1, block_k),
                          lambda bi, hi, ki, qi: (bi, 0, ki))
    dq_part_spec = pl.BlockSpec((1, 1, 1, block_q, d),
                                lambda bi, hi, ki, qi: (ki, bi, hi, qi, 0))

    dq_part, dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_fused_kernel, scale=scale, nq=nq),
        grid=(b, h, nk, nq),
        in_specs=[q_spec, k_spec, k_spec, q_spec, r_spec, r_spec, m_spec],
        out_specs=[dq_part_spec, k_spec, k_spec],
        out_shape=[jax.ShapeDtypeStruct((nk, b, h, s, d), jnp.float32),
                   jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, s, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
    )(q, k, v, do, lse, delta, mask_i)
    dq = jnp.sum(dq_part, axis=0).astype(q.dtype)
    return dq, dk, dv


def _flash_backward(q, k, v, do, out, lse, mask, block_q, block_k,
                    delta=None, fused=True):
    """(B, H, S, D) tensors + lse (B, H, S, 1) -> (dq, dk, dv).

    lse/delta keep a trailing singleton axis so their blocks are (BQ, 1)
    tiles (see _flash_forward on Mosaic's block-shape divisibility rule).
    ``delta`` (= sum_d dO*O, (B, H, S, 1)) may be passed precomputed: the
    ring backward calls this once per ring step with unchanged (do, out),
    so recomputing it inside would cost n redundant reductions."""
    b, h, s, d = q.shape
    scale = 1.0 / math.sqrt(d)
    nq = s // block_q
    nk = s // block_k
    if delta is None:
        delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                        axis=-1, keepdims=True)     # (B, H, S, 1)
    mask_i = mask.astype(jnp.int32)[:, None, :]     # (B, 1, S)

    if fused:
        return _flash_backward_fused(q, k, v, do, lse, delta, mask_i,
                                     block_q, block_k)

    q_spec_q = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    k_spec_q = pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, qi, ki: (bi, hi, ki, 0))
    r_spec_q = pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, qi, ki: (bi, hi, qi, 0))
    m_spec_q = pl.BlockSpec((1, 1, block_k), lambda bi, hi, qi, ki: (bi, 0, ki))

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, nk=nk),
        grid=(b, h, nq, nk),
        in_specs=[q_spec_q, k_spec_q, k_spec_q, q_spec_q, r_spec_q, r_spec_q,
                  m_spec_q],
        out_specs=q_spec_q,
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
    )(q, k, v, do, lse, delta, mask_i)

    # dkv grid: k blocks outer, q blocks inner (sequential accumulation)
    q_spec_k = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, ki, qi: (bi, hi, qi, 0))
    k_spec_k = pl.BlockSpec((1, 1, block_k, d), lambda bi, hi, ki, qi: (bi, hi, ki, 0))
    r_spec_k = pl.BlockSpec((1, 1, block_q, 1), lambda bi, hi, ki, qi: (bi, hi, qi, 0))
    m_spec_k = pl.BlockSpec((1, 1, block_k), lambda bi, hi, ki, qi: (bi, 0, ki))

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, nq=nq),
        grid=(b, h, nk, nq),
        in_specs=[q_spec_k, k_spec_k, k_spec_k, q_spec_k, r_spec_k, r_spec_k,
                  m_spec_k],
        out_specs=[k_spec_k, k_spec_k],
        out_shape=[jax.ShapeDtypeStruct((b, h, s, d), k.dtype),
                   jax.ShapeDtypeStruct((b, h, s, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
    )(q, k, v, do, lse, delta, mask_i)
    return dq, dk, dv


# --------------------------------------------------------------------------
# custom VJP: pallas forward, blockwise-recompute backward
# --------------------------------------------------------------------------

def _pad_seq(x, pad):
    return jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else x


def _seq_padding(s, *blocks):
    blk = max(blocks)
    return ((s + blk - 1) // blk) * blk - s


def _attn_padded(q, k, v, mask, block_q, block_k, use_pallas,
                 with_residuals=False, bwd_block_q=None, bwd_block_k=None):
    """Pad S to lcm-friendly multiples and dispatch. q,k,v (B, S, H, D).
    ``with_residuals`` also returns (out_padded, lse, mask_padded) for the
    flash-backward kernels (Pallas path only). The padding covers BOTH the
    forward and backward block sizes (all powers of two here, so the max is
    a common multiple) — the saved residuals are reused by the backward
    kernels at their own tiling."""
    b, s, h, d = q.shape
    pad = _seq_padding(s, block_q, block_k,
                       bwd_block_q or block_q, bwd_block_k or block_k)
    if mask is None:
        mask = jnp.ones((b, s), bool)
    if pad:
        q, k, v = _pad_seq(q, pad), _pad_seq(k, pad), _pad_seq(v, pad)
        mask = jnp.pad(mask.astype(bool), ((0, 0), (0, pad)))

    if use_pallas:
        qt = q.transpose(0, 2, 1, 3)  # (B, H, S, D)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        out_t, lse = _flash_forward(qt, kt, vt, mask, block_q, block_k)
        out = out_t.transpose(0, 2, 1, 3)
        if with_residuals:
            return out[:, :s] if pad else out, (out_t, lse, mask)
    else:
        out = blockwise_attention(q, k, v, mask, block_k=block_k)
        if with_residuals:
            return out[:, :s] if pad else out, None
    return out[:, :s] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_impl(q, k, v, block_q, block_k, bwd_block_q,
                          bwd_block_k, use_pallas, fused_bwd, mask):
    return _attn_padded(q, k, v, mask, block_q, block_k, use_pallas,
                        bwd_block_q=bwd_block_q, bwd_block_k=bwd_block_k)


def _flash_fwd_rule(q, k, v, block_q, block_k, bwd_block_q, bwd_block_k,
                    use_pallas, fused_bwd, mask):
    out, res = _attn_padded(q, k, v, mask, block_q, block_k, use_pallas,
                            with_residuals=True, bwd_block_q=bwd_block_q,
                            bwd_block_k=bwd_block_k)
    return out, (q, k, v, mask, res)


def _flash_bwd_rule(block_q, block_k, bwd_block_q, bwd_block_k, use_pallas,
                    fused_bwd, residuals, g):
    """Pallas path: FlashAttention-2 dq/dkv kernels over the saved
    (out, lse) — no forward recompute, no (S, S) tensor — at their own
    (bwd_block_q, bwd_block_k) tiling (the backward holds more per-program
    VMEM than the forward, so its optimum differs). XLA/CPU path:
    recompute attention blockwise under remat and let XLA differentiate
    the O(S*BK)-memory scan."""
    q, k, v, mask, res = residuals
    if res is not None:
        out_t, lse, mask_pad = res                 # padded, (B, H, S', D)
        b, s, h, d = q.shape
        pad = _seq_padding(s, block_q, block_k, bwd_block_q, bwd_block_k)
        gt = _pad_seq(g, pad).transpose(0, 2, 1, 3)
        qt = _pad_seq(q, pad).transpose(0, 2, 1, 3)
        kt = _pad_seq(k, pad).transpose(0, 2, 1, 3)
        vt = _pad_seq(v, pad).transpose(0, 2, 1, 3)
        dq, dk, dv = _flash_backward(qt, kt, vt, gt, out_t, lse, mask_pad,
                                     bwd_block_q, bwd_block_k,
                                     fused=fused_bwd)
        dq = dq.transpose(0, 2, 1, 3)[:, :s]
        dk = dk.transpose(0, 2, 1, 3)[:, :s]
        dv = dv.transpose(0, 2, 1, 3)[:, :s]
        return dq, dk, dv, None

    def f(q, k, v):
        return blockwise_attention(q, k, v, mask, block_k=block_k)

    _, vjp = jax.vjp(jax.checkpoint(f), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_impl.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q, k, v, mask: Optional[jnp.ndarray] = None, *,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    bwd_block_q: Optional[int] = None,
                    bwd_block_k: Optional[int] = None,
                    use_pallas: Optional[bool] = None,
                    fused_bwd: bool = True):
    """Flash attention over (B, S, H, D) tensors with optional (B, S) key mask.

    ``use_pallas=None`` auto-selects: the Pallas kernel on TPU, the XLA
    blockwise scan elsewhere (CPU tests, interpret mode).
    ``bwd_block_q``/``bwd_block_k`` tile the backward kernels independently
    of the forward (default: same as forward).
    ``fused_bwd`` selects the single-pass backward kernel (5 matmuls/tile)
    over the split dq + dkv pair (7 matmuls/tile); split kept for A/B
    profiling (`tools/profiler.py tune5000`).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    return _flash_attention_impl(q, k, v, block_q, block_k,
                                 bwd_block_q or block_q,
                                 bwd_block_k or block_k, use_pallas,
                                 fused_bwd, mask)


def make_attention_fn(threshold: int = 2048,
                      block_q: Optional[int] = None,
                      block_k: Optional[int] = None,
                      bwd_block_q: Optional[int] = None,
                      bwd_block_k: Optional[int] = None,
                      fused_bwd: bool = True):
    """attention_fn for vit.mhsa: flash attention for sequences past the
    threshold, plain XLA attention below it (small-S full attention is faster
    and XLA fuses it well). Block sizes default to the module-level tuned
    constants, resolved at CALL time (so sweeps can override the globals)."""

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
        return flash_attention(
            q, k, v, mask,
            block_q=block_q or DEFAULT_BLOCK_Q,
            block_k=block_k or DEFAULT_BLOCK_K,
            bwd_block_q=bwd_block_q or DEFAULT_BWD_BLOCK_Q,
            bwd_block_k=bwd_block_k or DEFAULT_BWD_BLOCK_K,
            fused_bwd=fused_bwd)

    return attention_fn


# --------------------------------------------------------------------------
# measured attention-choice policy
# --------------------------------------------------------------------------

# Quadratic-inference logits budget. Measured anchors (idle chip,
# tools/ab_infer5000.py 2026-08-19 + docs/OPERATIONS.md L16 table):
#   B16 5000p b2 quadratic: fp32 logits [4,12,5120,5120] ~ 5.0 GB -> FITS and
#     beats flash 1.31x fused / 1.34x forward-only (27.2 vs 20.7 pairs/s).
#   L16 5000p b8 quadratic: [16,16,5120,5120] ~ 26 GB -> OOM (flash required).
# The flash kernel exists for MEMORY, not forward speed: its per-program
# (BQ, 64) x (64, BK) matmuls are MXU-thin next to one big fused softmax, so
# inference should take quadratic whenever the logits buffer fits. The budget
# sits between the measured-fits B16 b2 point (4.8 GB) and the untested L16
# b2 point (6.4 GB) — only measured-safe shapes take the quadratic path.
QUAD_INFER_LOGITS_BUDGET = int(5.5 * 1024**3)  # bytes


def quad_logits_bytes(batch_rows: int, num_heads: int, seq: int) -> int:
    """Peak fp32 softmax-logits buffer of one quadratic attention layer.
    batch_rows counts ENCODER rows (2x pairs for the dual-tower model)."""
    return batch_rows * num_heads * seq * seq * 4


def choose_attention_fn(patch_count: int, *, train: bool,
                        batch_pairs: Optional[int] = None,
                        num_heads: int = 12, num_extra_tokens: int = 9):
    """Measured per-(variant, S, memory-fit) attention choice (VERDICT r4 #3).

    - Short sequences (< FLASH_ATTENTION_THRESHOLD): None — XLA's fused full
      attention wins and the logits trivially fit.
    - TRAINING past the threshold: flash, always — the quadratic backward
      saves (2B, heads, S, S) probs per layer for the VJP (multi-GB per
      layer at 5000p; OOM for every variant).
    - INFERENCE past the threshold: quadratic while the one-layer logits
      buffer fits QUAD_INFER_LOGITS_BUDGET (XLA reuses it across layers),
      flash only when it does not. With batch_pairs unknown, assume flash
      (the conservative choice — callers that know their batch pass it).
    """
    if patch_count < FLASH_ATTENTION_THRESHOLD:
        return None
    if train or batch_pairs is None:
        return make_attention_fn()
    seq = patch_count + num_extra_tokens
    if quad_logits_bytes(2 * batch_pairs, num_heads, seq) \
            <= QUAD_INFER_LOGITS_BUDGET:
        return None
    return make_attention_fn()
