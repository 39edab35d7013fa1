"""Perf experiments on the real TPU: gather strategies + attention variants.

Round-2 throughput work (VERDICT.md item 2): extraction and forward are ~50/50
of the fused 500-patch pipeline (profile_stages.py: 1.22 + 1.21 ms/pair).
This script A/B-tests candidate implementations before they land:

- gather: dynslice (current), flat per-pixel take, strip gather
  (one (1,P,C) slice per patch row), row-take + one-hot column matmul
  (contiguous 3KB row reads, column select on the MXU).
- attention @ S=512: XLA full softmax (current) vs the Pallas flash kernel.
- full forward with each attention variant.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments.py > /tmp/exp.log 2>&1 &
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
from vtamiq_tpu.ops.attention import make_attention_fn
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


# ---- gather variants --------------------------------------------------------

def gather_dynslice(img, ti, tj):
    def one(i, j):
        return jax.lax.dynamic_slice(img, (i, j, 0), (P, P, img.shape[2]))
    return jax.vmap(one)(ti, tj)


def gather_flat_take(img, ti, tj):
    h, w, c = img.shape
    flat = img.reshape(h * w, c)
    r = ti[:, None] + jnp.arange(P)[None, :]
    base = r * w
    cidx = tj[:, None, None] + jnp.arange(P)[None, None, :]
    idx = base[:, :, None] + cidx
    return flat[idx.reshape(-1)].reshape(-1, P, P, c)


def gather_strips(img, ti, tj):
    """One (1, P, C) gather slice per patch ROW: 8k indices, 96B each."""
    h, w, c = img.shape
    ri = (ti[:, None] + jnp.arange(P)[None, :]).reshape(-1)      # (N*P,)
    cj = jnp.broadcast_to(tj[:, None], (tj.shape[0], P)).reshape(-1)
    idx = jnp.stack([ri, cj], axis=-1)                            # (N*P, 2)
    out = jax.lax.gather(
        img, idx,
        dimension_numbers=jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(0,),
            start_index_map=(0, 1)),
        slice_sizes=(1, P, c),
        mode="clip")
    return out.reshape(-1, P, P, c)


def gather_rowtake_onehot(img, ti, tj):
    """Contiguous full-row take (N*P rows of W*C) then one-hot column-select
    matmul on the MXU — big DMA + tiny matmul, no per-pixel addresses."""
    h, w, c = img.shape
    n = ti.shape[0]
    ri = (ti[:, None] + jnp.arange(P)[None, :]).reshape(-1)       # (N*P,)
    rows = jnp.take(img.reshape(h, w * c), ri, axis=0)            # (N*P, W*C)
    rows = rows.reshape(n, P, w, c)
    cols = tj[:, None] + jnp.arange(P)[None, :]                   # (N, P)
    onehot = (jnp.arange(w)[None, :, None] == cols[:, None, :]).astype(img.dtype)
    return jnp.einsum("nrwc,nwk->nrkc", rows, onehot)


def bench_gather(name, fn):
    img = raw[0, 0].astype(jnp.bfloat16)
    k1, k2 = jax.random.split(key)
    ti = jax.random.randint(k1, (PATCHES,), 0, IMG_H - P)
    tj = jax.random.randint(k2, (PATCHES,), 0, IMG_W - P)

    @jax.jit
    def loop(img, ti, tj, key):
        def body(i, acc):
            o = jax.random.randint(jax.random.fold_in(key, i), (), 0, 4)
            out = fn(img, ti + o, tj)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS * 2 * BATCH, body, jnp.zeros((), jnp.float32))

    try:
        loop(img, ti, tj, key).block_until_ready()
        t0 = time.perf_counter()
        loop(img, ti, tj, key).block_until_ready()
        dt = time.perf_counter() - t0
        per_img = dt / (ITERS * 2 * BATCH) * 1e3
        print(f"gather[{name:18s}] {per_img:7.3f} ms/img ({PATCHES} patches)", flush=True)
    except Exception as e:
        print(f"gather[{name:18s}] FAILED: {type(e).__name__}: {e}", flush=True)


# ---- forward variants --------------------------------------------------------

cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
sampler = PatchSampler()
extract = make_extract_fn(sampler, ExtractConfig(patch_count=PATCHES, patch_dim=16))
patches0, pos0, _ = jax.jit(extract)(raw, key)
patches0 = patches0.block_until_ready()


def bench_forward(name, attention_fn):
    @jax.jit
    def loop(params, patches, pos, key):
        def body(i, acc):
            p = pos + jax.random.uniform(jax.random.fold_in(key, i), ()) * 1e-6
            q = vtamiq_forward(params, cfg, patches, p, None,
                               attention_fn=attention_fn)
            return acc + jnp.sum(q)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    try:
        loop(params, patches0, pos0, key).block_until_ready()
        t0 = time.perf_counter()
        loop(params, patches0, pos0, key).block_until_ready()
        dt = time.perf_counter() - t0
        pairs = BATCH * ITERS / dt
        print(f"forward[{name:20s}] {dt:7.3f}s  {pairs:9.1f} pairs/s  "
              f"{dt / ITERS / BATCH * 1e3:7.3f} ms/pair", flush=True)
    except Exception as e:
        print(f"forward[{name:20s}] FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    stages = sys.argv[1:] or ["gather", "forward"]
    if "gather" in stages:
        bench_gather("dynslice(cur)", gather_dynslice)
        bench_gather("flat_take", gather_flat_take)
        bench_gather("strips", gather_strips)
        bench_gather("rowtake_onehot", gather_rowtake_onehot)
    if "forward" in stages:
        bench_forward("xla_full(cur)", None)
        bench_forward("flash_512", make_attention_fn(threshold=256))
        bench_forward("flash_512_bq128", make_attention_fn(threshold=256, block_q=128, block_k=256))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
