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
q, k, v are (B, S, H, D); mask is (B, S) key validity.

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


def _ring_attention_local(q, k, v, mask, *, axis_name: str):
    """Per-shard ring attention body (runs under shard_map).

    q, k, v: (B, S_local, H, D) local shards; mask: (B, S_local) local key
    validity. Rotates (k, v, mask) around ``axis_name`` while accumulating
    the online softmax for the resident q. Returns (B, S_local, H, D).
    """
    n = jax.lax.psum(1, axis_name)
    b, s_loc, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    orig_dtype = q.dtype
    perm = [(i, (i + 1) % n) for i in range(n)]

    # remat the per-chunk block: differentiating the scan would otherwise
    # store every (B, H, S_loc, S_loc) prob block — the same memory/compute
    # trade as ops/attention.py's blockwise scan body.
    @jax.checkpoint
    def block_update(carry_acc, carry_m, carry_l, kb, vb, mb):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, kb,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mb[:, None, None, :], logits, NEG_INF)
        m_new = jnp.maximum(carry_m, logits.max(axis=-1))       # (B, H, Sq)
        p = jnp.exp(logits - m_new[..., None])                  # (B, H, Sq, Sk)
        correction = jnp.exp(carry_m - m_new)
        l_new = carry_l * correction + p.sum(axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bqhd", p.astype(orig_dtype), vb,
                        preferred_element_type=jnp.float32)
        acc = carry_acc * correction.transpose(0, 2, 1)[..., None] + pv
        return acc, m_new, l_new

    def body(carry, _):
        acc, m_run, l_run, kb, vb, mb = carry
        acc, m_run, l_run = block_update(acc, m_run, l_run, kb, vb, mb)
        # rotate K/V/mask to the next rank; the final rotation restores the
        # original placement (n steps of a cyclic shift are the identity)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        mb = jax.lax.ppermute(mb, axis_name, perm)
        return (acc, m_run, l_run, kb, vb, mb), None

    acc0 = jnp.zeros((b, s_loc, h, d), jnp.float32)
    m0 = jnp.full((b, h, s_loc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc), jnp.float32)
    (acc, m_run, l_run, _, _, _), _ = jax.lax.scan(
        body, (acc0, m0, l0, k, v, mask.astype(bool)), None, length=n)
    out = acc / jnp.maximum(l_run, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(orig_dtype)


def make_ring_attention(mesh: Mesh, seq_axis: str = SEQ_AXIS,
                        batch_axis: Optional[str] = DATA_AXIS):
    """Build ``attn(q, k, v, mask) -> out`` with the token axis sharded over
    ``seq_axis`` (and the batch over ``batch_axis`` when that axis exists in
    the mesh). S must be divisible by the seq-axis size; the ViT already pads
    its token axis to a multiple of 128 (models/vit.py), so any power-of-two
    ring divides it.
    """
    if batch_axis is not None and batch_axis not in mesh.axis_names:
        batch_axis = None
    qkv_spec = P(batch_axis, seq_axis, None, None)
    mask_spec = P(batch_axis, seq_axis)
    local = functools.partial(_ring_attention_local, axis_name=seq_axis)
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
