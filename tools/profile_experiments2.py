"""Forward-pass attention experiments, round 2: bf16 logits, mask cost,
official Pallas flash kernel. See profile_experiments.py for methodology.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments2.py > /tmp/exp2.log 2>&1 &
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

NEG_INF = -1e9


def attn_bf16_logits(q, k, v, mask):
    """Logits stay in compute dtype (bf16): halves the (B,H,S,S) HBM traffic;
    softmax still reduces in fp32 inside the fusion."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(d)
    if mask is not None:
        logits = jnp.where(mask[:, None, None, :], logits, jnp.asarray(NEG_INF, logits.dtype))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attn_nomask(q, k, v, mask):
    """DIAGNOSTIC ONLY (wrong numerics on padded tokens): measures the cost
    of the mask where-op."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attn_bias_add(q, k, v, mask):
    """Additive precomputed bias instead of where()."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    if mask is not None:
        bias = (1.0 - mask.astype(jnp.float32)) * NEG_INF  # (B, S)
        logits = logits + bias[:, None, None, :]
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def make_official_flash():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as of, SegmentIds)

    def fn(q, k, v, mask):
        d = q.shape[-1]
        qt = q.transpose(0, 2, 1, 3)  # (B, H, S, D)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        seg = None
        if mask is not None:
            m = mask.astype(jnp.int32)
            seg = SegmentIds(q=m, kv=m)
        out = of(qt, kt, vt, segment_ids=seg, sm_scale=1.0 / math.sqrt(d))
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
    bench_forward("xla_full(cur)", None)
    bench_forward("bf16_logits", attn_bf16_logits)
    bench_forward("nomask(diag)", attn_nomask)
    bench_forward("bias_add", attn_bias_add)
    bench_forward("official_flash", make_official_flash())
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
