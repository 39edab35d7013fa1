"""Round 8: forward-pass wins past 819.6 pairs/s.

(a) merged-QKV projection: one (H, 3H) matmul per layer instead of three
    (H, H) matmuls — fewer kernel dispatches, better MXU occupancy at
    (B*S, H) = (32768, 768).
(b) batch scaling: 32 -> 64 -> 128 (more rows per matmul amortizes fixed
    per-layer overhead; HBM for raw images grows 18 MB/batch-of-16).

Barriers follow CLAUDE.md rule 5: consume timed results via float() —
block_until_ready lies on the first post-compile result on this relay.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments8.py > /tmp/exp8.log 2>&1 &
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

PATCHES, IMG_H, IMG_W, ITERS = 500, 384, 512, 30

seed = int(time.time()) & 0x7FFFFFFF
rng = np.random.default_rng(seed)
key = jax.random.PRNGKey(seed)

cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
extract = make_extract_fn(PatchSampler(), ExtractConfig(patch_count=PATCHES, patch_dim=16))

print("device:", jax.devices()[0], "seed:", seed, flush=True)

_orig_mhsa = vit_mod.mhsa
NEG_INF = vit_mod.NEG_INF


def make_merged_qkv_mhsa():
    """QKV as one (H, 3H) matmul; attention math identical to production."""

    def mhsa_merged(p, x, num_heads, mask=None, attention_fn=None,
                    return_attention=False, logits_fp32=False, q_len=None):
        if return_attention or attention_fn is not None:
            return _orig_mhsa(p, x, num_heads, mask, attention_fn,
                              return_attention, logits_fp32, q_len)
        b, s, h = x.shape
        d = h // num_heads
        dtype = x.dtype
        w = jnp.concatenate([p["query"]["kernel"], p["key"]["kernel"],
                             p["value"]["kernel"]], axis=1).astype(dtype)
        bias = jnp.concatenate([p["query"]["bias"], p["key"]["bias"],
                                p["value"]["bias"]]).astype(dtype)
        qkv = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(dtype) + bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if q_len is not None:
            q = q[:, :q_len]
        q = q.reshape(b, q.shape[1], num_heads, d)
        k = k.reshape(b, s, num_heads, d)
        v = v.reshape(b, s, num_heads, d)
        logits_dtype = jnp.float32 if (logits_fp32 or dtype == jnp.float32) else dtype
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=logits_dtype) / math.sqrt(d)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :],
                               logits, jnp.asarray(NEG_INF, logits.dtype))
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                         preferred_element_type=jnp.float32).astype(dtype)
        ctx = ctx.reshape(b, q.shape[1], h)
        return vit_mod.dense(p["out"], ctx, dtype), None

    return mhsa_merged


def fused_loop(params, raw, key):
    def body(i, acc):
        p, uv, sc = extract(raw, jax.random.fold_in(key, i))
        q = vtamiq_forward(params, cfg, p, uv, sc)
        return acc + jnp.sum(q)
    return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))


def bench(name, batch, salt):
    raw = jnp.asarray(rng.uniform(0, 1, (batch, 2, IMG_H, IMG_W, 3)), jnp.float32)
    loop = jax.jit(fused_loop)
    try:
        float(loop(params, raw, jax.random.fold_in(key, salt)))  # compile+settle
        best = None
        for trial in range(3):
            t0 = time.perf_counter()
            out = float(loop(params, raw, jax.random.fold_in(key, salt + 10 + trial)))
            dt = time.perf_counter() - t0
            rate = batch * ITERS / dt
            if rate < 20000:  # physically plausible only
                best = max(best or 0.0, rate)
        if best is None:
            print(f"{name:30s} ALL TRIALS IMPLAUSIBLE", flush=True)
        else:
            print(f"{name:30s} {best:9.1f} pairs/s  "
                  f"{1e3/best:7.4f} s/1000pairs (out={out:.3f})", flush=True)
    except Exception as e:
        print(f"{name:30s} FAILED: {type(e).__name__}: {e}", flush=True)


def main():
    # numerics: merged vs production mhsa on one forward
    raw1 = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 2, IMG_H, IMG_W, 3)), jnp.float32)
    p1, uv1, sc1 = jax.jit(extract)(raw1, jax.random.PRNGKey(5))
    q_ref = jax.jit(lambda: vtamiq_forward(params, cfg, p1, uv1, sc1))()
    vit_mod.mhsa = make_merged_qkv_mhsa()
    q_m = jax.jit(lambda: vtamiq_forward(params, cfg, p1, uv1, sc1))()
    vit_mod.mhsa = _orig_mhsa
    print("merged-qkv max |dq|:", float(jnp.max(jnp.abs(q_ref - q_m))), flush=True)

    for batch, salt in ((32, 100), (64, 200)):
        vit_mod.mhsa = _orig_mhsa
        bench(f"current b{batch}", batch, salt)
        vit_mod.mhsa = make_merged_qkv_mhsa()
        bench(f"merged-qkv b{batch}", batch, salt + 1000)
    vit_mod.mhsa = make_merged_qkv_mhsa()
    bench("merged-qkv b128", 128, 3000)
    vit_mod.mhsa = _orig_mhsa
    bench("current b128", 128, 3100)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
