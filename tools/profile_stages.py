"""Stage-level throughput profiling on the real TPU.

Measures pairs/sec for: (1) extraction only, (2) dual-tower forward only on
pre-extracted patches, (3) the fused pipeline, plus gather-strategy variants.
Each stage loops inside ONE jit (lax.fori_loop) so per-dispatch relay latency
doesn't pollute the numbers (CLAUDE.md env rule 3); time-based seeds defeat
the TPU service's (program, inputs) memoization.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_stages.py > /tmp/profile.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
from vtamiq_tpu.ops.sampling import PatchSampler
from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

BATCH = 16
PATCHES = 500
IMG_H, IMG_W = 384, 512
ITERS = 30

cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
sampler = PatchSampler()
ecfg = ExtractConfig(patch_count=PATCHES, patch_dim=16)
extract = make_extract_fn(sampler, ecfg)

seed = int(time.time()) & 0x7FFFFFFF
rng = np.random.default_rng(seed)
raw = jnp.asarray(rng.uniform(0, 1, (BATCH, 2, IMG_H, IMG_W, 3)), jnp.float32)
key = jax.random.PRNGKey(seed)

print("device:", jax.devices()[0], flush=True)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = time.perf_counter() - t0
    pairs = BATCH * ITERS / dt
    print(f"{name:28s} {dt:7.3f}s  {pairs:9.1f} pairs/s  "
          f"{dt / ITERS / BATCH * 1e3:7.3f} ms/pair", flush=True)
    return pairs


# ---- 1. extraction only ----------------------------------------------------
@jax.jit
def extract_n(raw, key):
    def body(i, acc):
        patches, pos, _ = extract(raw, jax.random.fold_in(key, i))
        return acc + jnp.sum(patches.astype(jnp.float32)) + jnp.sum(pos)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


# ---- 2. forward only --------------------------------------------------------
patches0, pos0, _ = jax.jit(extract)(raw, key)
patches0 = patches0.block_until_ready()


@jax.jit
def forward_n(params, patches, pos, key):
    def body(i, acc):
        # perturb pos so the memoizer can't collapse iterations
        p = pos + jax.random.uniform(jax.random.fold_in(key, i), ()) * 1e-6
        q = vtamiq_forward(params, cfg, patches, p, None)
        return acc + jnp.sum(q)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


# ---- 3. fused ----------------------------------------------------------------
@jax.jit
def fused_n(params, raw, key):
    def body(i, acc):
        patches, pos, scales = extract(raw, jax.random.fold_in(key, i))
        q = vtamiq_forward(params, cfg, patches, pos, scales)
        return acc + jnp.sum(q)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


# ---- 4. gather variants -------------------------------------------------------
def gather_dynslice(img, ti, tj, P=16):
    def one(i, j):
        return jax.lax.dynamic_slice(img, (i, j, 0), (P, P, img.shape[2]))
    return jax.vmap(one)(ti, tj)


def gather_rows_then_cols(img, ti, tj, P=16):
    """Row-band gather (big contiguous DMA) then per-band column slice."""
    w = img.shape[1]

    def band(i):
        return jax.lax.dynamic_slice(img, (i, 0, 0), (P, w, img.shape[2]))
    bands = jax.vmap(band)(ti)                      # (N, P, W, C)

    def cols(b, j):
        return jax.lax.dynamic_slice(b, (0, j, 0), (P, P, img.shape[2]))
    return jax.vmap(cols)(bands, tj)


def gather_flat_take(img, ti, tj, P=16):
    """Flat fancy-index gather (one index per pixel row of a patch)."""
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    r = ti[:, None] + jnp.arange(P)[None, :]        # (N, P)
    base = r * w                                     # (N, P)
    cidx = tj[:, None, None] + jnp.arange(P)[None, None, :]
    idx = base[:, :, None] + cidx                    # (N, P, P)
    return flat[idx.reshape(-1)].reshape(-1, P, P, c)


def bench_gather(name, fn):
    img = raw[0, 0].astype(jnp.bfloat16)
    k1, k2 = jax.random.split(key)
    ti = jax.random.randint(k1, (PATCHES,), 0, IMG_H - 16)
    tj = jax.random.randint(k2, (PATCHES,), 0, IMG_W - 16)

    @jax.jit
    def loop(img, ti, tj, key):
        def body(i, acc):
            o = jax.random.randint(jax.random.fold_in(key, i), (), 0, 4)
            out = fn(img, ti + o, tj)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS * 2 * BATCH, body, jnp.zeros((), jnp.float32))

    loop(img, ti, tj, key).block_until_ready()
    t0 = time.perf_counter()
    loop(img, ti, tj, key).block_until_ready()
    dt = time.perf_counter() - t0
    per_img = dt / (ITERS * 2 * BATCH) * 1e3
    print(f"gather[{name:16s}] {per_img:7.3f} ms/img "
          f"({PATCHES} patches)", flush=True)


def main():
    stages = sys.argv[1:] or ["gather", "extract", "forward", "fused"]
    if "gather" in stages:
        bench_gather("dynslice(cur)", gather_dynslice)
        bench_gather("rows+cols", gather_rows_then_cols)
        bench_gather("flat_take", gather_flat_take)
    if "extract" in stages:
        timeit("extract only", extract_n, raw, key)
    if "forward" in stages:
        timeit("forward only", forward_n, params, patches0, pos0, key)
    if "fused" in stages:
        timeit("fused pipeline", fused_n, params, raw, key)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
