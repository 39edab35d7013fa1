"""Extraction breakdown, round 5: where do the ~1.2 ms/pair go?

Times each sub-stage of the fused extract step in its real vmapped context:
sampling only, normalization only, gather only (fixed positions), and the
full extract. All loops run inside one jit (CLAUDE.md env rule 3).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments5.py > /tmp/exp5.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from vtamiq_tpu.ops.extraction import gather_patches
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

sampler = PatchSampler()
extract = make_extract_fn(sampler, ExtractConfig(patch_count=PATCHES, patch_dim=16))

print("device:", jax.devices()[0], flush=True)


def timeit(name, make_loop, data):
    # warmup and timed runs use DIFFERENT keys: the TPU service memoizes
    # executions by (program, inputs), so an identical repeat replays a
    # cached result in ~0s (CLAUDE.md env rule 3)
    loop = jax.jit(make_loop)
    try:
        loop(data, jax.random.fold_in(key, 111)).block_until_ready()
        t0 = time.perf_counter()
        loop(data, jax.random.fold_in(key, 222)).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"{name:26s} {dt:7.3f}s  {dt / ITERS / BATCH * 1e3:7.3f} ms/pair", flush=True)
    except Exception as e:
        print(f"{name:26s} FAILED: {type(e).__name__}: {e}", flush=True)


# 1. sampling only: one aligned draw per batch item (as in extract)
def sample_loop(raw, key):
    def one(key):
        return sampler.sample(key, IMG_H, IMG_W, P, PATCHES)

    def body(i, acc):
        keys = jax.random.split(jax.random.fold_in(key, i), BATCH)
        pos = jax.vmap(one)(keys)
        return acc + jnp.sum(pos)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


# 2. normalize only
def norm_loop(raw, key):
    def body(i, acc):
        o = jax.random.uniform(jax.random.fold_in(key, i), ()) * 1e-6
        t = ((raw + o - 0.5) / 0.5).astype(jnp.bfloat16)
        return acc + jnp.sum(t.astype(jnp.float32))
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


# 3. gather only: fixed positions, normalized bf16 input precomputed
tensors0 = ((raw - 0.5) / 0.5).astype(jnp.bfloat16)


def gather_loop(tensors, key):
    k1, k2 = jax.random.split(key)
    ti = jax.random.randint(k1, (BATCH, PATCHES), 0, IMG_H - P)
    tj = jax.random.randint(k2, (BATCH, PATCHES), 0, IMG_W - P)

    def one(img2, ti, tj):  # img2: (2, H, W, 3)
        tl = jnp.stack([ti, tj], 0).astype(jnp.float32)
        return jnp.stack([gather_patches(img2[k], tl, P) for k in range(2)])

    def body(i, acc):
        o = jax.random.randint(jax.random.fold_in(key, i), (), 0, 4)
        out = jax.vmap(one)(tensors, ti + o, tj)
        return acc + jnp.sum(out.astype(jnp.float32))
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


# 4. full extract
def extract_loop(raw, key):
    def body(i, acc):
        patches, pos, _ = extract(raw, jax.random.fold_in(key, i))
        return acc + jnp.sum(patches.astype(jnp.float32)) + jnp.sum(pos)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


# 5. extract but consuming only a scalar slice of patches (dead-code probe:
# does XLA keep the full gather alive?)
def extract_loop_light(raw, key):
    def body(i, acc):
        patches, pos, _ = extract(raw, jax.random.fold_in(key, i))
        return acc + jnp.sum(patches[..., 0, 0, 0].astype(jnp.float32)) + jnp.sum(pos)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


def main():
    timeit("sampling only", sample_loop, raw)
    timeit("normalize only", norm_loop, raw)
    timeit("gather only (fixed pos)", gather_loop, tensors0)
    timeit("full extract", extract_loop, raw)
    timeit("extract (light consume)", extract_loop_light, raw)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
