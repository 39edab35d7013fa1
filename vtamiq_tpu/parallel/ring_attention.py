"""Ring attention: sequence parallelism across chips for very long patch
sequences.

The reference's "long context" story is the CAPS patch budget (SURVEY.md §5:
patch_count up to 5000; full quadratic attention, transformer.py:158-164).
One v5e chip already trains the 5000-patch config via the Pallas flash kernel
(ops/attention.py). Ring attention is the scale-out beyond that: shard the
token axis over a mesh axis, keep each device's Q block local, and rotate
K/V (+key-validity mask) chunks around the ring with ``ppermute`` while an
online softmax accumulates — O(S/n) activation memory per chip and the
collective rides ICI neighbor links, overlapping with the per-chunk matmuls.

This is new TPU-native capability with no reference counterpart (the
reference is single-GPU; SURVEY.md §2.5). Layout matches ops/attention.py:
q, k, v are (B, S, H, D); mask is (B, S) key validity. On TPU each rank
runs the Pallas flash kernels per chunk (ring-flash — see the section
comment below); elsewhere an einsum chunk body with the same merge and the
same hand-derived ring backward.

Usage (inside or outside jit):

    mesh = make_seq_mesh(seq=8)                      # or any Mesh with a seq axis
    attn = make_ring_attention(mesh)                 # (q, k, v, mask) -> out
    out = attn(q, k, v, mask)

``make_ring_attention_fn`` adapts it to ``vit.mhsa``'s attention_fn slot so a
sequence-sharded ViT forward uses the ring transparently.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map
except ImportError:  # pre-0.8 jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, *, mesh, in_specs, out_specs):
    """Version-agnostic shard_map (the replication-check kwarg was renamed
    check_rep -> check_vma across jax 0.8)."""
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, **kw)
        except TypeError:
            continue
    raise TypeError("no compatible shard_map signature found")

from .mesh import DATA_AXIS

SEQ_AXIS = "seq"

NEG_INF = -1e30


def make_seq_mesh(seq: int = -1, data: int = 1, devices=None) -> Mesh:
    """A ("data", "seq") mesh; seq=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if seq == -1:
        if n % data != 0:
            raise ValueError(f"{n} devices not divisible by data={data}.")
        seq = n // data
    if data * seq > n:
        raise ValueError(f"Mesh {data}x{seq} needs {data * seq} devices; have {n}.")
    grid = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS))


# --------------------------------------------------------------------------
# ring FLASH attention: Pallas flash blocks inside each rank
# --------------------------------------------------------------------------
#
# A naive per-rank body (round 2's remat-einsum scan) materializes
# (B, H, S_loc, S_loc) logits per chunk step. For large local shards (e.g.
# 40k tokens over 8 chips = 5k local) that is the same quadratic wall the
# flash kernel removes on one chip — so the ring runs the ops.attention
# Pallas kernels per chunk:
#
#   forward: each arriving K/V chunk yields (o_i, lse_i) from the flash
#     kernel; chunks merge online:  m = max(m, lse_i),
#     num = num*e^(m_old-m) + o_i*e^(lse_i-m),  den likewise; out = num/den,
#     global lse = m + log(den).
#   backward (hand-derived custom VJP): with GLOBAL (out, lse), the
#     per-chunk probabilities p_ij = exp(q k_j * scale - lse_i) are exactly
#     the global softmax restricted to the chunk, so the FlashAttention-2
#     dq/dkv kernels apply per chunk unchanged; (k, v, dk, dv) rotate
#     together around the ring and arrive home after n steps (the ppermute
#     transpose IS the reverse ring, written explicitly here).
#
# Chunk block sizes must divide S_loc; _chunk_blocks picks the largest
# 128-multiple divisor. The ViT pads its token axis to a 128-multiple, but
# the PER-RANK shard S/n can still be smaller than or not divisible by 128
# (e.g. 512 tokens over seq=8 -> 64): those configs fall back to the einsum
# chunk body (identical math/merge; Mosaic requires 128-lane blocks).


def _chunk_blocks(s_loc: int) -> int:
    for b in (1024, 512, 256, 128):
        if s_loc % b == 0:
            return b
    return 0  # no 128-aligned divisor: caller takes the einsum chunk path


def _xla_chunk_forward(qt, kt, vt, kmask, scale):
    """(B, H, Sq, D) x (B, H, Sk, D) -> (o normalized, lse (B, H, Sq, 1));
    reference semantics for the flash kernel on CPU/interpret paths."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kmask[:, None, None, :], logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    o = jnp.einsum("bhqk,bhkd->bhqd", (p / l).astype(vt.dtype), vt,
                   preferred_element_type=jnp.float32).astype(qt.dtype)
    return o, (m + jnp.log(l))


def _xla_chunk_backward(qt, kt, vt, dot, lse, delta, kmask, scale):
    """Chunk gradients given GLOBAL lse/delta — the einsum mirror of the
    Pallas dq/dkv kernels (ops/attention.py)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", qt, kt,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kmask[:, None, None, :], logits, NEG_INF)
    p = jnp.exp(logits - lse)                       # (B, H, Sq, Sk) fp32
    dp = jnp.einsum("bhqd,bhkd->bhqk", dot, vt,
                    preferred_element_type=jnp.float32)
    ds = p * (dp - delta) * scale
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds.astype(kt.dtype), kt,
                    preferred_element_type=jnp.float32)
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds.astype(qt.dtype), qt,
                    preferred_element_type=jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p.astype(dot.dtype), dot,
                    preferred_element_type=jnp.float32)
    return dq, dk, dv


def _make_ring_flash_local(axis_name: str, use_pallas: bool):
    """Build the per-shard ring-flash body with a hand-derived VJP."""
    from ..ops.attention import _flash_forward, _flash_backward

    @jax.custom_vjp
    def ring_flash(q, k, v, mask):
        out, _lse = _ring_flash_fwd_impl(q, k, v, mask)
        return out

    def _ring_flash_fwd_impl(q, k, v, mask):
        n = jax.lax.psum(1, axis_name)
        b, s_loc, h, d = q.shape
        scale = 1.0 / math.sqrt(d)
        blk = _chunk_blocks(s_loc) if use_pallas else 0
        flash = use_pallas and blk > 0
        perm = [(i, (i + 1) % n) for i in range(n)]
        qt = q.transpose(0, 2, 1, 3)                # (B, H, Sq, D)

        def body(carry, _):
            m, num, den, kc, vc, mc = carry
            kt = kc.transpose(0, 2, 1, 3)
            vt = vc.transpose(0, 2, 1, 3)
            if flash:
                o_i, lse_i = _flash_forward(qt, kt, vt, mc, blk, blk)
            else:
                o_i, lse_i = _xla_chunk_forward(qt, kt, vt, mc, scale)
            m_new = jnp.maximum(m, lse_i)
            c_old = jnp.exp(m - m_new)
            c_i = jnp.exp(lse_i - m_new)
            num = num * c_old + o_i.astype(jnp.float32) * c_i
            den = den * c_old + c_i
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            mc = jax.lax.ppermute(mc, axis_name, perm)
            return (m_new, num, den, kc, vc, mc), None

        m0 = jnp.full((b, h, s_loc, 1), NEG_INF, jnp.float32)
        num0 = jnp.zeros((b, h, s_loc, d), jnp.float32)
        den0 = jnp.zeros((b, h, s_loc, 1), jnp.float32)
        (m, num, den, _, _, _), _ = jax.lax.scan(
            body, (m0, num0, den0, k, v, mask.astype(bool)), None, length=n)
        out_t = (num / jnp.maximum(den, 1e-30)).astype(q.dtype)
        lse = m + jnp.log(jnp.maximum(den, 1e-30))  # (B, H, Sq, 1) GLOBAL
        return out_t.transpose(0, 2, 1, 3), (out_t, lse)

    def fwd_rule(q, k, v, mask):
        out, (out_t, lse) = _ring_flash_fwd_impl(q, k, v, mask)
        return out, (q, k, v, mask, out_t, lse)

    def bwd_rule(res, g):
        q, k, v, mask, out_t, lse = res
        n = jax.lax.psum(1, axis_name)
        b, s_loc, h, d = q.shape
        scale = 1.0 / math.sqrt(d)
        blk = _chunk_blocks(s_loc) if use_pallas else 0
        flash = use_pallas and blk > 0
        perm = [(i, (i + 1) % n) for i in range(n)]
        qt = q.transpose(0, 2, 1, 3)
        dot = g.transpose(0, 2, 1, 3).astype(q.dtype)  # (B, H, Sq, D)
        delta = jnp.sum(dot.astype(jnp.float32) * out_t.astype(jnp.float32),
                        axis=-1, keepdims=True)        # (B, H, Sq, 1)

        def body(carry, _):
            dq_acc, kc, vc, mc, dk_acc, dv_acc = carry
            kt = kc.transpose(0, 2, 1, 3)
            vt = vc.transpose(0, 2, 1, 3)
            if flash:
                dq_i, dk_i, dv_i = _flash_backward(
                    qt, kt, vt, dot, out_t, lse, mc, blk, blk, delta=delta)
            else:
                dq_i, dk_i, dv_i = _xla_chunk_backward(
                    qt, kt, vt, dot, lse, delta, mc, scale)
            dq_acc = dq_acc + dq_i.astype(jnp.float32)
            dk_acc = dk_acc + dk_i.astype(jnp.float32)
            dv_acc = dv_acc + dv_i.astype(jnp.float32)
            # (k, v, mask, dk, dv) travel TOGETHER: after n rotations each
            # chunk's gradient accumulators arrive back at the home rank
            # having collected every rank's contribution
            kc = jax.lax.ppermute(kc, axis_name, perm)
            vc = jax.lax.ppermute(vc, axis_name, perm)
            mc = jax.lax.ppermute(mc, axis_name, perm)
            dk_acc = jax.lax.ppermute(dk_acc, axis_name, perm)
            dv_acc = jax.lax.ppermute(dv_acc, axis_name, perm)
            return (dq_acc, kc, vc, mc, dk_acc, dv_acc), None

        z = jnp.zeros((b, h, s_loc, d), jnp.float32)
        (dq_acc, _, _, _, dk_acc, dv_acc), _ = jax.lax.scan(
            body, (z, k, v, mask.astype(bool), z, z), None, length=n)
        dq = dq_acc.transpose(0, 2, 1, 3).astype(q.dtype)
        dk = dk_acc.transpose(0, 2, 1, 3).astype(k.dtype)
        dv = dv_acc.transpose(0, 2, 1, 3).astype(v.dtype)
        return dq, dk, dv, None

    ring_flash.defvjp(fwd_rule, bwd_rule)
    return ring_flash


def make_ring_attention(mesh: Mesh, seq_axis: str = SEQ_AXIS,
                        batch_axis: Optional[str] = DATA_AXIS,
                        use_flash: Optional[bool] = None):
    """Build ``attn(q, k, v, mask) -> out`` with the token axis sharded over
    ``seq_axis`` (and the batch over ``batch_axis`` when that axis exists in
    the mesh). S must be divisible by the seq-axis size; the ViT already pads
    its token axis to a multiple of 128 (models/vit.py), so any power-of-two
    ring divides it.

    ``use_flash``: run the ops.attention Pallas flash kernels inside each
    rank (ring-flash) instead of the remat-einsum body — O(S_loc) memory per
    chunk step instead of (S_loc, S_loc) logits. None auto-selects: Pallas
    on TPU, the einsum chunk math elsewhere (same merge/backward structure,
    exercised by the CPU tests). Shards whose S_local has no 128-aligned
    block divisor (e.g. 512 tokens over seq=8) take the einsum chunk body
    even on TPU — Mosaic needs 128-lane blocks; small shards don't need
    flash memory savings anyway.
    """
    if batch_axis is not None and batch_axis not in mesh.axis_names:
        batch_axis = None
    qkv_spec = P(batch_axis, seq_axis, None, None)
    mask_spec = P(batch_axis, seq_axis)
    if use_flash is None:
        use_flash = jax.default_backend() not in ("cpu",)
    local = _make_ring_flash_local(seq_axis, use_pallas=use_flash)
    sharded = shard_map(local, mesh=mesh,
                        in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
                        out_specs=qkv_spec)

    def attn(q, k, v, mask: Optional[jnp.ndarray] = None):
        n = mesh.shape[seq_axis]
        if q.shape[1] % n:
            raise ValueError(
                f"sequence length {q.shape[1]} not divisible by the "
                f"{seq_axis!r} axis size {n}; pad the token axis first.")
        if mask is None:
            mask = jnp.ones(q.shape[:2], bool)
        return sharded(q, k, v, mask)

    return attn


def make_ring_attention_fn(mesh: Mesh, seq_axis: str = SEQ_AXIS,
                           batch_axis: Optional[str] = DATA_AXIS):
    """Adapter for ``vit.mhsa``'s attention_fn slot: a sequence-sharded ViT
    forward (activations sharded (batch, seq) by GSPMD) computes attention
    via the ring instead of materializing the full (S, S) logits per chip."""
    attn = make_ring_attention(mesh, seq_axis=seq_axis, batch_axis=batch_axis)

    def attention_fn(q, k, v, mask):
        return attn(q, k, v, mask)

    return attention_fn
