"""Round 7: (a) flash attention with transpose-free (B,H,S,D) projections
(einsum folds the head transpose into the matmul output layout — the
explicit transposes around the flash kernel moved ~150 MB/layer in round 3);
(b) normalize-fused Pallas gather (raw fp32 image in, normalized bf16
patches out — deletes the full-image normalize pass).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments7.py > /tmp/exp7.log 2>&1 &
"""

import functools
import math
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import vtamiq_tpu.models.vit as vit_mod
from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
from vtamiq_tpu.ops.sampling import PatchSampler
from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

BATCH, PATCHES, IMG_H, IMG_W, ITERS = 16, 500, 384, 512, 30

seed = int(time.time()) & 0x7FFFFFFF
rng = np.random.default_rng(seed)
raw = jnp.asarray(rng.uniform(0, 1, (BATCH, 2, IMG_H, IMG_W, 3)), jnp.float32)
key = jax.random.PRNGKey(seed)

cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
extract = make_extract_fn(PatchSampler(), ExtractConfig(patch_count=PATCHES, patch_dim=16))

print("device:", jax.devices()[0], flush=True)

_orig_mhsa = vit_mod.mhsa


# --------------------------------------------------------------------------
# (a) transpose-free flash mhsa
# --------------------------------------------------------------------------

def make_flash_mhsa(block_b=8, bq=512, bk=512):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as of, SegmentIds, BlockSizes)
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=block_b,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)

    def mhsa_flash(p, x, num_heads, mask=None, attention_fn=None,
                   return_attention=False, logits_fp32=False, q_len=None):
        if return_attention or q_len is not None:
            return _orig_mhsa(p, x, num_heads, mask, attention_fn,
                              return_attention, logits_fp32, q_len)
        b, s, h = x.shape
        d = h // num_heads
        dtype = x.dtype

        def proj_t(pp):  # (B, S, E) -> (B, H, S, D), transpose fused into matmul
            w = pp["kernel"].reshape(h, num_heads, d).astype(dtype)
            bias = pp["bias"].reshape(num_heads, 1, d).astype(dtype)
            y = jnp.einsum("bse,ehd->bhsd", x, w,
                           preferred_element_type=jnp.float32).astype(dtype)
            return y + bias

        q, k, v = proj_t(p["query"]), proj_t(p["key"]), proj_t(p["value"])
        seg = None
        if mask is not None:
            m = mask.astype(jnp.int32)
            seg = SegmentIds(q=m, kv=m)
        ctx = of(q, k, v, segment_ids=seg, sm_scale=1.0 / math.sqrt(d),
                 block_sizes=bs)                               # (B, H, S, D)
        wo = p["out"]["kernel"].reshape(num_heads, d, h).astype(dtype)
        out = jnp.einsum("bhsd,hde->bse", ctx, wo,
                         preferred_element_type=jnp.float32).astype(dtype)
        return out + p["out"]["bias"].astype(dtype), None
    return mhsa_flash


# --------------------------------------------------------------------------
# (b) normalize-fused gather kernel
# --------------------------------------------------------------------------

def _norm_gather_kernel(ti_ref, tj_ref, img_ref, out_ref, *,
                        patch_dim, num_patches, c, mean, inv_std):
    h, wc = img_ref.shape
    band_rows = patch_dim + 8

    # per-lane channel constants built from scalars (pallas kernels cannot
    # capture traced array constants)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, patch_dim * c), 1) % c

    def chanvec(vals):
        v = jnp.full((1, patch_dim * c), float(vals[0]), jnp.float32)
        for ci in range(1, c):
            v = jnp.where(idx == ci, float(vals[ci]), v)
        return v

    mean_row = chanvec(mean)
    inv_row = chanvec(inv_std)

    def body(k, carry):
        i = ti_ref[k]
        j = tj_ref[k]
        base = pl.multiple_of(jnp.minimum((i // 8) * 8, h - band_rows), 8)
        band = img_ref[pl.ds(base, band_rows), :]
        band = pltpu.roll(band, band_rows - (i - base), 0)
        rot = pltpu.roll(band[:patch_dim], wc - j * c, 1)
        tile = (rot[:, : patch_dim * c] - mean_row) * inv_row
        out_ref[pl.ds(k * patch_dim, patch_dim), :] = tile.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, num_patches, body, 0)


def norm_gather(img_raw, ti, tj, patch_dim=16, mean=(0.5,) * 3, std=(0.5,) * 3,
                out_dtype=jnp.bfloat16):
    h, w, c = img_raw.shape
    n = ti.shape[0]
    inv_std = tuple(1.0 / s for s in std)
    kernel = functools.partial(_norm_gather_kernel, patch_dim=patch_dim,
                               num_patches=n, c=c, mean=mean, inv_std=inv_std)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(1,),
            in_specs=[pl.BlockSpec((h, w * c), lambda g, ti, tj: (0, 0))],
            out_specs=pl.BlockSpec((n * patch_dim, patch_dim * c),
                                   lambda g, ti, tj: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n * patch_dim, patch_dim * c), out_dtype),
    )(ti.astype(jnp.int32), tj.astype(jnp.int32), img_raw.reshape(h, w * c))
    return out.reshape(n, patch_dim, patch_dim, c)


def extract_fused_norm(imgs_raw, key):
    """Uniform-sampler extraction with normalize fused into the gather."""
    from vtamiq_tpu.ops.sampling import sample_positions_uniform
    b = imgs_raw.shape[0]
    keys = jax.random.split(key, b)

    def one(raw2, k):
        tl = sample_positions_uniform(k, IMG_H, IMG_W, 16, PATCHES)
        ti = jnp.clip(jnp.floor(tl[0]).astype(jnp.int32), 0, IMG_H - 16)
        tj = jnp.clip(jnp.floor(tl[1]).astype(jnp.int32), 0, IMG_W - 16)
        patches = jnp.stack([norm_gather(raw2[i], ti, tj) for i in range(2)])
        half = 8
        hw_ratio = jnp.array([IMG_H - half, IMG_W - half], jnp.float32)
        uv = (tl.T + half) / hw_ratio
        uv = jnp.clip(uv, 0.0, 1.0 - 1e-6)
        return patches, jnp.stack([uv, uv])

    return jax.vmap(one)(imgs_raw, keys)


def bench(name, loop, *args):
    loop = jax.jit(loop)
    try:
        loop(*args, jax.random.fold_in(key, 111)).block_until_ready()
        t0 = time.perf_counter()
        loop(*args, jax.random.fold_in(key, 222)).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"{name:26s} {dt:7.3f}s  {BATCH*ITERS/dt:9.1f} pairs/s  "
              f"{dt/ITERS/BATCH*1e3:7.3f} ms/pair", flush=True)
    except Exception as e:
        print(f"{name:26s} FAILED: {type(e).__name__}: {e}", flush=True)


def fused_loop(params, raw, key):
    def body(i, acc):
        p, uv, sc = extract(raw, jax.random.fold_in(key, i))
        q = vtamiq_forward(params, cfg, p, uv, sc)
        return acc + jnp.sum(q)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


def fused_loop_ng(params, raw, key):
    def body(i, acc):
        p, uv = extract_fused_norm(raw, jax.random.fold_in(key, i))
        q = vtamiq_forward(params, cfg, p, uv, None)
        return acc + jnp.sum(q)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


def main():
    # numerics spot-check of norm_gather vs reference math
    img = raw[0, 0]
    r2 = np.random.default_rng(3)
    ti = jnp.asarray(r2.integers(0, IMG_H - 16, 33), jnp.int32)
    tj = jnp.asarray(r2.integers(0, IMG_W - 16, 33), jnp.int32)
    got = jax.jit(norm_gather, static_argnums=(3,))(img, ti, tj, 16)
    want = jnp.stack([((jax.lax.dynamic_slice(img, (int(i), int(j), 0), (16, 16, 3))
                        - 0.5) / 0.5) for i, j in zip(ti, tj)])
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    print("norm_gather max err vs fp32:", err, flush=True)

    bench("fused current", fused_loop, params, raw)
    vit_mod.mhsa = make_flash_mhsa(8)
    bench("fused flash-einsum bb8", fused_loop, params, raw)
    vit_mod.mhsa = make_flash_mhsa(8, bq=256, bk=512)
    bench("fused flash-einsum q256", fused_loop, params, raw)
    vit_mod.mhsa = _orig_mhsa
    bench("fused normgather", fused_loop_ng, params, raw)
    vit_mod.mhsa = make_flash_mhsa(8)
    bench("fused flash+normgather", fused_loop_ng, params, raw)
    vit_mod.mhsa = _orig_mhsa
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
