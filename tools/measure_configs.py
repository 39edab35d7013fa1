"""Round-2 re-measurement of the non-headline configs: weighted CAPS and
the 5000-patch PIPAL config (inference + training) — both share the Pallas
gather / bf16-logits wins with the headline 500-patch path.

Barriers per CLAUDE.md rule 5: consume timed results via float(); reject
physically-implausible readings.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/measure_configs.py > /tmp/measure.log 2>&1 &
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
from vtamiq_tpu.ops.sampling import (PatchSampler, GRID_TYPE_PERTURBED,
                                     DIFF_TYPE_MAGNITUDE)
from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

IMG_H, IMG_W = 384, 512
seed = int(time.time()) & 0x7FFFFFFF
rng = np.random.default_rng(seed)
key = jax.random.PRNGKey(seed)
print("device:", jax.devices()[0], "seed:", seed, flush=True)


def measure(name, batch, iters, loop, ceiling, *args):
    loop = jax.jit(loop)
    try:
        float(loop(*args, jax.random.fold_in(key, 1)))
        best = None
        for t in range(3):
            t0 = time.perf_counter()
            out = float(loop(*args, jax.random.fold_in(key, 2 + t)))
            dt = time.perf_counter() - t0
            rate = batch * iters / dt
            if rate < ceiling:
                best = max(best or 0.0, rate)
        if best is None:
            print(f"{name:42s} ALL TRIALS IMPLAUSIBLE", flush=True)
        else:
            print(f"{name:42s} {best:8.1f} pairs/s  (out={out:.3f})", flush=True)
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}: {e}", flush=True)


def inference_case(name, sampler, patch_count, batch, iters, ceiling,
                   remat=False):
    from vtamiq_tpu.ops.attention import make_attention_fn, \
        FLASH_ATTENTION_THRESHOLD
    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6,
                                          num_extra_tokens=8, remat=remat))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    extract = make_extract_fn(sampler, ExtractConfig(patch_count=patch_count,
                                                     patch_dim=16))
    # long sequences route through the Pallas flash kernel, same as
    # train/steps.py:167 does for the production paths
    attention_fn = (make_attention_fn()
                    if patch_count >= FLASH_ATTENTION_THRESHOLD else None)
    raw = jnp.asarray(rng.uniform(0, 1, (batch, 2, IMG_H, IMG_W, 3)), jnp.float32)

    def loop(params, raw, k):
        def body(i, acc):
            p, uv, sc = extract(raw, jax.random.fold_in(k, i))
            return acc + jnp.sum(vtamiq_forward(params, cfg, p, uv, sc,
                                                attention_fn=attention_fn))
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    measure(name, batch, iters, loop, ceiling, params, raw)


def train_weighted_caps():
    """Full weighted-CAPS (centerbias + diff + uniform) fused train step at
    the round-1 measurement config (B8 x 384p)."""
    import optax
    from vtamiq_tpu.train.steps import make_train_step
    from vtamiq_tpu.train.optim import build_freeze_mask
    batch, patches = 8, 384
    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adamw(5e-5, weight_decay=0.01)
    opt_state = optimizer.init(params)
    mask = build_freeze_mask(params, False, None)
    sampler = PatchSampler(centerbias_weight=1.0, diff_weight=1.0,
                           uniform_weight=0.1, grid_type=GRID_TYPE_PERTURBED,
                           diff_type=DIFF_TYPE_MAGNITUDE)
    step = make_train_step(cfg, sampler,
                           ExtractConfig(patch_count=patches, patch_dim=16),
                           optimizer)
    raw = jnp.asarray(rng.uniform(0, 1, (batch, 2, IMG_H, IMG_W, 3)), jnp.float32)
    qs = jnp.asarray(rng.uniform(0, 1, (batch,)), jnp.float32)
    lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)
    try:
        rates = []
        p, o = params, opt_state
        p, o, m, _ = step(p, o, mask, raw, qs, jnp.asarray(batch),
                          jax.random.fold_in(key, 0), lw)
        float(m["loss"])  # compile + settle
        for t in range(1, 9):
            t0 = time.perf_counter()
            p, o, m, _ = step(p, o, mask, raw, qs, jnp.asarray(batch),
                              jax.random.fold_in(key, t), lw)
            float(m["loss"])
            rate = batch / (time.perf_counter() - t0)
            if rate < 2000:
                rates.append(rate)
        if rates:
            print(f"{'train weighted CAPS B8 x 384p':42s} "
                  f"{max(rates):8.1f} pairs/s", flush=True)
        else:
            print("train weighted CAPS: ALL TRIALS IMPLAUSIBLE", flush=True)
    except Exception as e:
        print(f"train weighted CAPS FAILED: {type(e).__name__}: {e}", flush=True)


def train_5000p():
    import optax
    from vtamiq_tpu.train.steps import make_train_step
    from vtamiq_tpu.train.optim import build_freeze_mask
    batch, patches, iters = 4, 5000, 4
    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6,
                                          num_extra_tokens=8, remat=True))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adamw(5e-5, weight_decay=0.01)
    opt_state = optimizer.init(params)
    mask = build_freeze_mask(params, False, None)
    step = make_train_step(cfg, PatchSampler(),
                           ExtractConfig(patch_count=patches, patch_dim=16),
                           optimizer)
    raw = jnp.asarray(rng.uniform(0, 1, (batch, 2, IMG_H, IMG_W, 3)), jnp.float32)
    qs = jnp.asarray(rng.uniform(0, 1, (batch,)), jnp.float32)
    lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)

    try:
        t_all = []
        p, o = params, opt_state
        p, o, m, _ = step(p, o, mask, raw, qs, jnp.asarray(batch),
                          jax.random.fold_in(key, 0), lw)
        float(m["loss"])  # compile + settle
        for t in range(1, 7):
            t0 = time.perf_counter()
            p, o, m, _ = step(p, o, mask, raw, qs, jnp.asarray(batch),
                              jax.random.fold_in(key, t), lw)
            float(m["loss"])
            dt = time.perf_counter() - t0
            rate = batch / dt
            if rate < 100:
                t_all.append(rate)
        if t_all:
            print(f"{'train 5000p batch 4 (remat)':42s} "
                  f"{max(t_all):8.1f} pairs/s", flush=True)
        else:
            print("train 5000p: ALL TRIALS IMPLAUSIBLE", flush=True)
    except Exception as e:
        print(f"train 5000p FAILED: {type(e).__name__}: {e}", flush=True)


def main(cases=None):
    cases = cases or sys.argv[1:] or ["500p", "caps", "5000p", "train5000p"]
    if "500p" in cases:
        inference_case("inference 500p uniform batch 32", PatchSampler(),
                       500, 32, 30, 20000)
    if "caps" in cases:
        weighted = PatchSampler(centerbias_weight=1.0, diff_weight=1.0,
                                uniform_weight=0.1,
                                grid_type=GRID_TYPE_PERTURBED,
                                diff_type=DIFF_TYPE_MAGNITUDE)
        inference_case("inference 500p weighted CAPS batch 32", weighted,
                       500, 32, 30, 20000)
    if "5000p" in cases:
        inference_case("inference 5000p flash batch 8", PatchSampler(),
                       5000, 8, 4, 2000)
    if "traincaps" in cases:
        train_weighted_caps()
    if "train5000p" in cases:
        train_5000p()
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
