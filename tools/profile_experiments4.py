"""Gather experiments, round 4: variants measured inside the REAL vmapped
extraction path (profile_experiments.py's isolated single-image microbench
mispredicted: strips won 0.245 vs 0.690 ms/img isolated, but extract-only
got SLOWER, 1.457 vs 1.223 ms/pair — vmap over the batch changes the XLA
gather lowering).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments4.py > /tmp/exp4.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

import vtamiq_tpu.ops.extraction as extraction
from vtamiq_tpu.ops.sampling import PatchSampler
from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

BATCH = 16
PATCHES = 500
IMG_H, IMG_W = 384, 512
ITERS = 30
P = 16

seed = int(time.time()) & 0x7FFFFFFF
rng = np.random.default_rng(seed)
raw = jnp.asarray(rng.uniform(0, 1, (BATCH, 2, IMG_H, IMG_W, 3)), jnp.float32)
key = jax.random.PRNGKey(seed)

print("device:", jax.devices()[0], flush=True)


def prep(topleft, h, w, patch_dim):
    ti = jnp.clip(jnp.floor(topleft[0]).astype(jnp.int32), 0, h - patch_dim)
    tj = jnp.clip(jnp.floor(topleft[1]).astype(jnp.int32), 0, w - patch_dim)
    return ti, tj


def gp_dynslice(img, topleft, patch_dim):
    h, w, c = img.shape
    ti, tj = prep(topleft, h, w, patch_dim)

    def slice_one(i, j):
        return jax.lax.dynamic_slice(img, (i, j, 0), (patch_dim, patch_dim, c))
    return jax.vmap(slice_one)(ti, tj)


def gp_strips(img, topleft, patch_dim):
    h, w, c = img.shape
    n = topleft.shape[1]
    ti, tj = prep(topleft, h, w, patch_dim)
    ri = (ti[:, None] + jnp.arange(patch_dim)[None, :]).reshape(-1)
    cj = jnp.broadcast_to(tj[:, None], (n, patch_dim)).reshape(-1)
    idx = jnp.stack([ri, cj], axis=-1)
    out = jax.lax.gather(
        img, idx,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1)),
        slice_sizes=(1, patch_dim, c),
        mode="clip")
    return out.reshape(n, patch_dim, patch_dim, c)


def gp_flat_take(img, topleft, patch_dim):
    h, w, c = img.shape
    n = topleft.shape[1]
    ti, tj = prep(topleft, h, w, patch_dim)
    flat = img.reshape(h * w, c)
    r = ti[:, None] + jnp.arange(patch_dim)[None, :]
    base = r * w
    cidx = tj[:, None, None] + jnp.arange(patch_dim)[None, None, :]
    idx = base[:, :, None] + cidx
    return flat[idx.reshape(-1)].reshape(n, patch_dim, patch_dim, c)


def gp_strips_1d(img, topleft, patch_dim):
    """Strip gather over a FLAT (H*W, C) image: 1-D start indices, so the
    vmapped/batched lowering cannot fall back to a 2-D scatter-gather."""
    h, w, c = img.shape
    n = topleft.shape[1]
    ti, tj = prep(topleft, h, w, patch_dim)
    flat = img.reshape(h * w, c)
    ri = (ti[:, None] + jnp.arange(patch_dim)[None, :])      # (N, P)
    start = (ri * w + tj[:, None]).reshape(-1, 1)            # (N*P, 1)
    out = jax.lax.gather(
        flat, start,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,)),
        slice_sizes=(patch_dim, c),
        mode="clip")                                         # (N*P, P, C)
    return out.reshape(n, patch_dim, patch_dim, c)


def bench_extract(name, fn):
    extraction.gather_patches = fn
    extract = make_extract_fn(PatchSampler(), ExtractConfig(patch_count=PATCHES, patch_dim=16))

    @jax.jit
    def loop(raw, key):
        def body(i, acc):
            patches, pos, _ = extract(raw, jax.random.fold_in(key, i))
            return acc + jnp.sum(patches.astype(jnp.float32)) + jnp.sum(pos)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    try:
        loop(raw, key).block_until_ready()
        t0 = time.perf_counter()
        loop(raw, key).block_until_ready()
        dt = time.perf_counter() - t0
        pairs = BATCH * ITERS / dt
        print(f"extract[{name:18s}] {dt:7.3f}s  {pairs:9.1f} pairs/s  "
              f"{dt / ITERS / BATCH * 1e3:7.3f} ms/pair", flush=True)
    except Exception as e:
        print(f"extract[{name:18s}] FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    orig = extraction.gather_patches
    try:
        bench_extract("strips(cur)", gp_strips)
        bench_extract("dynslice(old)", gp_dynslice)
        bench_extract("flat_take", gp_flat_take)
        bench_extract("strips_1d", gp_strips_1d)
    finally:
        extraction.gather_patches = orig
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
