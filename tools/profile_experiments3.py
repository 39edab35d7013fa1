"""Attention experiments, round 3: official Pallas flash kernel with
batch-blocked grids (block_b) to amortize per-program overhead at S=512.

After bf16 logits, the XLA full-softmax path still moves ~800MB of
(B,H,S,S) traffic per layer per batch; a flash kernel that keeps the MXU
busy would remove nearly all of it. Round-2 experiments showed the default
grid (B*H*nq*nk = 768 tiny programs) is overhead-bound; block_b folds
several batch items into one program.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments3.py > /tmp/exp3.log 2>&1 &
"""

import math
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

seed = int(time.time()) & 0x7FFFFFFF
rng = np.random.default_rng(seed)
raw = jnp.asarray(rng.uniform(0, 1, (BATCH, 2, IMG_H, IMG_W, 3)), jnp.float32)
key = jax.random.PRNGKey(seed)

cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
sampler = PatchSampler()
extract = make_extract_fn(sampler, ExtractConfig(patch_count=PATCHES, patch_dim=16))
patches0, pos0, _ = jax.jit(extract)(raw, key)
patches0 = patches0.block_until_ready()

print("device:", jax.devices()[0], flush=True)


def make_official_flash(block_b, block_q=512, block_k=512):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as of, SegmentIds, BlockSizes)

    bs = BlockSizes(
        block_q=block_q, block_k_major=block_k, block_k=block_k, block_b=block_b,
        block_q_major_dkv=block_q, block_k_major_dkv=block_k,
        block_k_dkv=block_k, block_q_dkv=block_q,
        block_k_major_dq=block_k, block_k_dq=block_k, block_q_dq=block_q,
    )

    def fn(q, k, v, mask):
        d = q.shape[-1]
        qt = q.transpose(0, 2, 1, 3)  # (B, H, S, D)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        seg = None
        if mask is not None:
            m = mask.astype(jnp.int32)
            seg = SegmentIds(q=m, kv=m)
        out = of(qt, kt, vt, segment_ids=seg, sm_scale=1.0 / math.sqrt(d),
                 block_sizes=bs)
        return out.transpose(0, 2, 1, 3)
    return fn


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
        print(f"forward[{name:22s}] {dt:7.3f}s  {pairs:9.1f} pairs/s  "
              f"{dt / ITERS / BATCH * 1e3:7.3f} ms/pair", flush=True)
    except Exception as e:
        print(f"forward[{name:22s}] FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    bench_forward("bf16_logits(cur)", None)
    for bb in (4, 8, 16, 32):
        bench_forward(f"oflash_bb{bb}", make_official_flash(bb))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
