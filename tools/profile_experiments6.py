"""Round 6: last forward trims on the fused pipeline — official flash (bb8)
at S=512 and a fused-QKV projection — measured end-to-end.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments6.py > /tmp/exp6.log 2>&1 &
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


def mhsa_fused_qkv(params, x, num_heads, mask=None, attention_fn=None,
                   return_attention=False, logits_fp32=False, q_len=None):
    if return_attention or q_len is not None:
        return _orig_mhsa(params, x, num_heads, mask, attention_fn,
                          return_attention, logits_fp32, q_len)
    b, s, h = x.shape
    d = h // num_heads
    dtype = x.dtype
    wqkv = jnp.concatenate([params["query"]["kernel"], params["key"]["kernel"],
                            params["value"]["kernel"]], axis=1).astype(dtype)
    bqkv = jnp.concatenate([params["query"]["bias"], params["key"]["bias"],
                            params["value"]["bias"]]).astype(dtype)
    qkv = (jnp.dot(x, wqkv, preferred_element_type=jnp.float32).astype(dtype)
           + bqkv)
    q, k, v = [t.reshape(b, s, num_heads, d) for t in jnp.split(qkv, 3, axis=-1)]
    if attention_fn is not None:
        ctx = attention_fn(q, k, v, mask)
    else:
        ldt = jnp.float32 if (logits_fp32 or dtype == jnp.float32) else dtype
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=ldt) / math.sqrt(d)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits,
                               jnp.asarray(vit_mod.NEG_INF, logits.dtype))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(dtype)
    ctx = ctx.reshape(b, s, h)
    return vit_mod.dense(params["out"], ctx, dtype), None


def make_oflash(block_b=8, bs_qk=512):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as of, SegmentIds, BlockSizes)
    bs = BlockSizes(block_q=bs_qk, block_k_major=bs_qk, block_k=bs_qk, block_b=block_b,
                    block_q_major_dkv=bs_qk, block_k_major_dkv=bs_qk,
                    block_k_dkv=bs_qk, block_q_dkv=bs_qk,
                    block_k_major_dq=bs_qk, block_k_dq=bs_qk, block_q_dq=bs_qk)

    def fn(q, k, v, mask):
        d = q.shape[-1]
        seg = None
        if mask is not None:
            m = mask.astype(jnp.int32)
            seg = SegmentIds(q=m, kv=m)
        out = of(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                 v.transpose(0, 2, 1, 3), segment_ids=seg,
                 sm_scale=1.0 / math.sqrt(d), block_sizes=bs)
        return out.transpose(0, 2, 1, 3)
    return fn


def bench_fused(name, attention_fn=None, fused_qkv=False):
    vit_mod.mhsa = mhsa_fused_qkv if fused_qkv else _orig_mhsa

    @jax.jit
    def loop(params, raw, key):
        def body(i, acc):
            p, uv, sc = extract(raw, jax.random.fold_in(key, i))
            q = vtamiq_forward(params, cfg, p, uv, sc, attention_fn=attention_fn)
            return acc + jnp.sum(q)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    try:
        loop(params, raw, jax.random.fold_in(key, 111)).block_until_ready()
        t0 = time.perf_counter()
        loop(params, raw, jax.random.fold_in(key, 222)).block_until_ready()
        dt = time.perf_counter() - t0
        print(f"fused[{name:22s}] {dt:7.3f}s  {BATCH*ITERS/dt:9.1f} pairs/s  "
              f"{dt/ITERS/BATCH*1e3:7.3f} ms/pair", flush=True)
    except Exception as e:
        print(f"fused[{name:22s}] FAILED: {type(e).__name__}: {e}", flush=True)
    finally:
        vit_mod.mhsa = _orig_mhsa


def main():
    bench_fused("current")
    bench_fused("qkv_fused", fused_qkv=True)
    bench_fused("oflash_bb8", attention_fn=make_oflash(8))
    bench_fused("oflash_bb8+qkv", attention_fn=make_oflash(8), fused_qkv=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
