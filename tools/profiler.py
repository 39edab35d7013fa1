"""Parameterized TPU profiler for vtamiq_tpu — the one tool replacing the
round-2 `profile_stages.py`, `measure_configs.py`, and the ten numbered
`profile_experiments*.py` scripts (their findings live in
docs/OPERATIONS.md; every measurement they made is reproducible here).

Methodology (CLAUDE.md env rules):
- every timed loop runs inside ONE jit via lax.fori_loop (rule 3: the
  tunneled relay's per-dispatch latency would otherwise dominate);
- timed results are consumed via float() — the only reliable completion
  barrier on this service (rule 5);
- time-based seeds + a program salt defeat the service's (program, inputs)
  execution memoization (rule 3);
- implausibly-fast readings (past the physical roofline) are rejected.

Subcommands:
  stages     extract-only / forward-only / fused pipeline rates
  extract    extraction sub-stage breakdown (sampling / gather / full)
  attention  attention variants at a given S: XLA softmax vs Pallas flash,
             optional block-size sweep
  train      fused train-step rate (fwd+bwd+AdamW), optional grad-of-flash
             backward A/B (Pallas kernels vs XLA recompute)
  configs    the tracked non-headline configs (weighted CAPS, 5000p)
  variants   fused-inference rate per ViT backbone variant (B16/B8/L16)

Examples:
  PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profiler.py stages > /tmp/prof.log 2>&1 &
  ... profiler.py attention --patches 5000 --sweep
  ... profiler.py train --patches 5000 --batch 2 --ab-backward
"""

import argparse
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
from vtamiq_tpu.ops.attention import flash_attention
from vtamiq_tpu.ops.sampling import (PatchSampler, GRID_TYPE_PERTURBED,
                                     DIFF_TYPE_MAGNITUDE)
from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

IMG_H, IMG_W = 384, 512

SEED = int(time.time()) & 0x7FFFFFFF
SALT = (int(time.time_ns()) % 997) * 1e-13


def build(args):
    cfg = VTAMIQConfig(vit=get_vit_config(getattr(args, "variant", "B16"),
                                          num_keep_layers=args.layers,
                                          num_extra_tokens=8))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    if args.weighted:
        sampler = PatchSampler(diff_weight=1.0, uniform_weight=0.1,
                               grid_type=GRID_TYPE_PERTURBED,
                               diff_type=DIFF_TYPE_MAGNITUDE)
    else:
        sampler = PatchSampler()
    ecfg = ExtractConfig(patch_count=args.patches, patch_dim=16,
                         norm_mean=(0.5 + SALT, 0.5, 0.5))
    return cfg, params, sampler, ecfg


from vtamiq_tpu.utils.benchharness import (fresh_pair_batch, timed_median,
                                           ImplausiblyFast)


def fresh_raw(batch):
    return fresh_pair_batch(batch, IMG_H, IMG_W)


def timeit(fn, pairs_per_call, bound, label, trials=3):
    """Median of plausible trials. fn(t) must end in a host transfer."""
    try:
        rate = timed_median(fn, pairs_per_call, bound, trials)
    except ImplausiblyFast:
        print(f"{label}: ALL TRIALS IMPLAUSIBLY FAST (relay replay)", flush=True)
        return None
    print(f"{label}: {rate:.1f} pairs/s ({1e3 / rate:.3f} ms/pair)", flush=True)
    return rate


def loop_jit(body_fn, iters):
    """jit(fori_loop(body)) with a float32 checksum carry."""
    @jax.jit
    def run(params, raw, key):
        def body(i, acc):
            return acc + body_fn(params, raw, jax.random.fold_in(key, i))
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
    return run


def infer_attention_fn(patch_count: int, batch_pairs=None, num_heads=12,
                       num_extra_tokens=9):
    """Measured inference policy (ops/attention.choose_attention_fn):
    quadratic while the one-layer logits buffer fits (B16 b2 5000p: fits and
    beats flash 1.3x — tools/ab_infer5000.py), flash past the budget (L16
    5000p quadratic is f32[16,16,5120,5120] = 26 GB — flash is the only way
    to run, not an optimization)."""
    from vtamiq_tpu.ops.attention import choose_attention_fn
    return choose_attention_fn(patch_count, train=False,
                               batch_pairs=batch_pairs, num_heads=num_heads,
                               num_extra_tokens=num_extra_tokens)


def cmd_stages(args):
    cfg, params, sampler, ecfg = build(args)
    extract = make_extract_fn(sampler, ecfg)
    iters = args.iters
    attn_fn = infer_attention_fn(args.patches, batch_pairs=args.batch,
                                 num_heads=cfg.vit.num_heads,
                                 num_extra_tokens=cfg.vit.num_tokens)

    def extract_sum(params, raw, key):
        patches, pos, _ = extract(raw, key)
        return jnp.sum(patches.astype(jnp.float32)) + jnp.sum(pos)

    def fused(params, raw, key):
        patches, pos, scales = extract(raw, key)
        return jnp.sum(vtamiq_forward(params, cfg, patches, pos, scales,
                                      attention_fn=attn_fn))

    raw, key = fresh_raw(args.batch)
    pairs = args.batch * iters
    for label, body, bound in [("extract-only", extract_sum, 20000.0),
                               ("fused", fused, 5000.0)]:
        run = loop_jit(body, iters)
        float(run(params, raw, jax.random.fold_in(key, 9999)))
        timeit(lambda t, run=run: run(params, raw, jax.random.fold_in(key, t)),
               pairs, bound, label)

    # forward-only on pre-extracted patches (extraction excluded). TWO traps
    # here (both measured, 2026-08-18): (a) if the loop body is
    # loop-invariant, XLA hoists the forward out of the fori_loop and 30
    # "iterations" execute ONE forward — the reading is 30x too fast and the
    # plausibility filter rejects it; (b) identical (program, inputs) across
    # trials are served from the relay's execution memo (CLAUDE.md rule 3).
    # The per-trial salt scalar fixes (b); multiplying it with the iteration
    # index into the patches fixes (a).
    patches, pos, scales = jax.jit(extract)(raw, key)

    @jax.jit
    def fwd_loop(params, patches, pos, scales, salt):
        def body(i, acc):
            p_i = patches * (1.0 + salt * 1e-6 + i.astype(patches.dtype) * 1e-6)
            return acc + jnp.sum(vtamiq_forward(params, cfg, p_i, pos, scales,
                                                attention_fn=attn_fn))
        return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

    float(fwd_loop(params, patches, pos, scales, jnp.float32(-1.0)))
    timeit(lambda t: fwd_loop(params, patches, pos, scales, jnp.float32(t)),
           pairs, 5000.0, "forward-only")


def cmd_extract(args):
    cfg, params, sampler, ecfg = build(args)
    iters = args.iters
    raw, key = fresh_raw(args.batch)
    pairs = args.batch * iters

    # full extract
    extract = make_extract_fn(sampler, ecfg)

    def full(params, raw, key):
        patches, pos, _ = extract(raw, key)
        return jnp.sum(patches.astype(jnp.float32)) + jnp.sum(pos)

    # sampling only (positions, no gather); diff map included when weighted
    from vtamiq_tpu.ops.sampling import compute_diff_map

    def sampling_only(params, raw, key):
        def one(img, k):
            diff = (compute_diff_map(img, sampler.diff_type)
                    if not sampler.is_uniform else None)
            pos = sampler.sample(k, IMG_H, IMG_W, ecfg.patch_dim,
                                 ecfg.patch_count, diff=diff)
            return jnp.sum(pos)
        keys = jax.random.split(key, raw.shape[0])
        return jnp.sum(jax.vmap(one)(raw, keys))

    for label, body in [("extract-full", full), ("sampling-only", sampling_only)]:
        run = loop_jit(body, iters)
        float(run(params, raw, jax.random.fold_in(key, 9999)))
        timeit(lambda t, run=run: run(params, raw, jax.random.fold_in(key, t)),
               pairs, 50000.0, label)


def cmd_attention(args):
    b, h, d = args.batch, 12, 64
    s = args.seq if args.seq else args.patches + 9
    s = ((s + 127) // 128) * 128
    iters = args.iters
    key = jax.random.PRNGKey(SEED)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, s, 12, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, 12, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, 12, d), jnp.bfloat16)
    print(f"attention: B={b} S={s} H=12 D={d} bf16", flush=True)

    import math as _math

    def xla_attn(q, k, v):
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / _math.sqrt(d)
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                          preferred_element_type=jnp.float32).astype(q.dtype)

    variants = {"xla-softmax": xla_attn}
    blocks = [(512, 1024)]
    if args.sweep:
        blocks = [(256, 512), (512, 512), (512, 1024), (1024, 1024),
                  (512, 2048), (1024, 2048)]
    for bq, bk in blocks:
        if s % bq or s % bk:
            continue
        variants[f"flash-bq{bq}-bk{bk}"] = (
            lambda q, k, v, bq=bq, bk=bk: flash_attention(
                q, k, v, block_q=bq, block_k=bk, use_pallas=True))

    for label, fn in variants.items():
        @jax.jit
        def run(q, k, v, fn=fn):
            def body(i, acc):
                return acc + jnp.sum(fn(q * (1 + SALT * i), k, v)
                                     .astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))
        try:
            # 4*S^2*D*H*B flops fwd; readings past ~2x the v5e bf16 peak
            # (394 TFLOPS) are memoized replays (CLAUDE.md rules 3/5), as
            # is re-timing the warmup's exact (program, inputs) — each
            # timed trial perturbs q so the service must actually execute
            fl = 4 * s * s * d * 12 * b
            float(run(q, k, v))  # compile + warm
            dts = []
            for t in range(1, 4):
                qt = q * (1 + SALT * t)
                t0 = time.perf_counter()
                float(run(qt, k, v))
                dt = (time.perf_counter() - t0) / iters
                if fl / dt < 800e12:  # plausible
                    dts.append(dt)
            if not dts:
                print(f"{label}: all trials implausibly fast (memoized?)",
                      flush=True)
                continue
            dt = sorted(dts)[len(dts) // 2]
            print(f"{label}: {dt * 1e3:.2f} ms/call "
                  f"({fl / dt / 1e12:.1f} TFLOPS)", flush=True)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


def cmd_train(args):
    import optax
    from vtamiq_tpu.train.steps import make_train_step
    from vtamiq_tpu.train.optim import build_freeze_mask
    cfg, params, sampler, ecfg = build(args)
    optimizer = optax.adamw(5e-5, weight_decay=0.01)
    opt_state = optimizer.init(params)
    mask = build_freeze_mask(params, False, None)
    step = make_train_step(cfg, sampler, ecfg, optimizer)
    raw, key = fresh_raw(args.batch)
    rng = np.random.default_rng(SEED)
    qs = jnp.asarray(rng.uniform(0, 1, (args.batch,)), jnp.float32)
    lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)

    def run_steps(k, n):
        nonlocal params, opt_state
        for i in range(n):
            params, opt_state, metrics, _ = step(
                params, opt_state, mask, raw, qs, jnp.asarray(args.batch),
                jax.random.fold_in(k, i), lw)
        return float(metrics["loss"])

    run_steps(jax.random.fold_in(key, 42), 1)
    n = max(3, args.iters // 10)
    timeit(lambda t: run_steps(jax.random.fold_in(key, 100 + t), n) or 1.0,
           args.batch * n, 1500.0, f"train-step ({args.patches}p, b{args.batch})")

    if args.ab_backward:
        # A/B the flash-attention VJP in isolation: Pallas bwd kernels vs
        # the XLA blockwise-recompute fallback
        s = ((args.patches + 9 + 127) // 128) * 128
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(SEED + 1), 3)
        q = jax.random.normal(kq, (args.batch * 2, s, 12, 64), jnp.bfloat16)
        k = jax.random.normal(kk, (args.batch * 2, s, 12, 64), jnp.bfloat16)
        v = jax.random.normal(kv, (args.batch * 2, s, 12, 64), jnp.bfloat16)
        for label, use_pallas in [("pallas-bwd", True), ("recompute-bwd", False)]:
            def loss(q, k, v, up=use_pallas):
                return jnp.sum(flash_attention(q, k, v, use_pallas=up)
                               .astype(jnp.float32) ** 2)
            g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

            @jax.jit
            def rung(q, k, v, g=g):
                def body(i, acc):
                    gs = g(q * (1 + SALT * i), k, v)
                    return acc + sum(jnp.sum(x.astype(jnp.float32)) for x in gs)
                return jax.lax.fori_loop(0, 5, body, jnp.zeros((), jnp.float32))
            try:
                # fwd+bwd ~ 3x fwd attention flops; perturb inputs per
                # trial so the timed runs can't be memoized replays
                fl = 3 * 4 * s * s * 64 * 12 * (args.batch * 2)
                float(rung(q, k, v))
                dts = []
                for t in range(1, 4):
                    qt = q * (1 + SALT * t)
                    t0 = time.perf_counter()
                    float(rung(qt, k, v))
                    dt = (time.perf_counter() - t0) / 5
                    if fl / dt < 800e12:
                        dts.append(dt)
                if not dts:
                    print(f"{label}: all trials implausibly fast "
                          f"(memoized?)", flush=True)
                    continue
                dt = sorted(dts)[len(dts) // 2]
                print(f"{label}: {dt * 1e3:.1f} ms/grad", flush=True)
            except Exception as e:
                print(f"{label}: FAILED {type(e).__name__}: {e}", flush=True)


def cmd_tune5000(args):
    """Two-stage 5000-patch TRAIN tuning (round-3 perf pass).

    Stage 1: grad-of-flash-attention at S≈5120 over backward block pairs
    (the fwd optimum (512, 1024) was tuned for the forward's VMEM shape;
    the backward holds q/k/v/do tiles + two fp32 (BQ, BK) intermediates).
    Stage 2: full fused train-step rate over batch x remat with the best
    backward blocks monkeypatched into the module defaults.
    """
    import dataclasses
    import optax
    from vtamiq_tpu.ops import attention as attn_mod
    from vtamiq_tpu.train.steps import make_train_step
    from vtamiq_tpu.train.optim import build_freeze_mask

    # head count follows the variant (L16 is 1024-hidden/16-head; head_dim
    # stays 64 across all three backbones — reference transformer.py
    # get_B8/B16/L16_config)
    b, d, h = 4, 64, (16 if args.variant == "L16" else 12)
    s = ((args.patches + 9 + 127) // 128) * 128
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(SEED), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    print(f"stage 1: attention grad, B={b} S={s} H={h} D={d} bf16", flush=True)
    if args.skip_stage1:
        print("stage 1 skipped (--skip-stage1): using committed bwd block "
              "defaults", flush=True)

    fl = 3 * 4 * s * s * d * h * b  # fwd+bwd ~ 3x fwd attention flops
    best = (None, float("inf"))
    # round-4: the sweep candidates are (bq, bk, fused). The fused
    # single-pass kernel (5 matmuls/tile vs split's 7) is swept over block
    # pairs; the split pair runs once at its round-3 optimum (1024, 1024)
    # as the A/B baseline. Candidate count stays bounded for slow
    # remote-compile days (CLAUDE.md round-3 gotchas).
    pairs = [(512, 1024, True), (512, 512, True), (1024, 512, True),
             (1024, 1024, True), (256, 1024, True), (1024, 1024, False)]
    if args.skip_stage1:
        pairs = []
    for bq, bk, fused in pairs:
        if s % bq or s % bk:
            continue

        def loss(q, k, v, bq=bq, bk=bk, fused=fused):
            return jnp.sum(flash_attention(
                q, k, v, block_q=512, block_k=1024, bwd_block_q=bq,
                bwd_block_k=bk, use_pallas=True,
                fused_bwd=fused).astype(jnp.float32) ** 2)
        g = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def rung(q, k, v, g=g):
            def body(i, acc):
                gs = g(q * (1 + SALT * i), k, v)
                return acc + sum(jnp.sum(x.astype(jnp.float32)) for x in gs)
            return jax.lax.fori_loop(0, 5, body, jnp.zeros((), jnp.float32))
        try:
            float(rung(q, k, v))
            dts = []
            for t in range(1, 4):
                qt = q * (1 + SALT * t)
                t0 = time.perf_counter()
                float(rung(qt, k, v))
                dt = (time.perf_counter() - t0) / 5
                if fl / dt < 800e12:
                    dts.append(dt)
            tag = "fused" if fused else "split"
            if not dts:
                print(f"bwd-{tag}-bq{bq}-bk{bk}: implausibly fast "
                      f"(memoized?)", flush=True)
                continue
            dt = sorted(dts)[len(dts) // 2]
            print(f"bwd-{tag}-bq{bq}-bk{bk}: {dt * 1e3:.1f} ms/grad",
                  flush=True)
            if fused and dt < best[1]:
                best = ((bq, bk), dt)
        except Exception as e:
            tag = "fused" if fused else "split"
            print(f"bwd-{tag}-bq{bq}-bk{bk}: FAILED {type(e).__name__}: {e}",
                  flush=True)
    if best[0] is None:
        if not args.skip_stage1:
            print("stage 1 produced no plausible readings; aborting",
                  flush=True)
            return
    else:
        print(f"best bwd blocks: {best[0]} ({best[1] * 1e3:.1f} ms)",
              flush=True)
        attn_mod.DEFAULT_BWD_BLOCK_Q, attn_mod.DEFAULT_BWD_BLOCK_K = best[0]

    print(f"stage 2: fused {args.variant} train step at {args.patches}p, "
          f"batch x remat", flush=True)
    ecfg = ExtractConfig(patch_count=args.patches, patch_dim=16,
                         norm_mean=(0.5 + SALT, 0.5, 0.5))
    sampler = PatchSampler()
    optimizer = optax.adamw(5e-5, weight_decay=0.01)
    # 4 variants, not the full 3x2 grid (compile cost, see stage-1 note):
    # the round-2 production point (4, remat), non-remat at the same batch
    # (the Pallas backward no longer needs the recompute, so paying full
    # activation storage may now beat recompute), and the batch neighbors
    # round-4 grid: no-remat won at batch 4 (round 3), so probe batch 8
    # both ways — the VERDICT-r03 lever is batch 4->8 if HBM allows
    grid = ((4, False), (8, False), (8, True), (4, True))
    if args.grid:  # e.g. --grid 4:0,8:1 -> [(4, False), (8, True)]
        grid = tuple((int(b), bool(int(r)))
                     for b, r in (leg.split(":") for leg in args.grid.split(",")))
    for batch, remat in grid:
        cfg = VTAMIQConfig(vit=dataclasses.replace(
            get_vit_config(args.variant, num_keep_layers=args.layers,
                           num_extra_tokens=8), remat=remat))
        try:
            params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
            opt_state = optimizer.init(params)
            fmask = build_freeze_mask(params, False, None)
            step = make_train_step(cfg, sampler, ecfg, optimizer)
            raw, key = fresh_raw(batch)
            rng = np.random.default_rng(SEED)
            qs = jnp.asarray(rng.uniform(0, 1, (batch,)), jnp.float32)
            lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)

            def run_steps(t, n=3):
                nonlocal params, opt_state
                for i in range(n):
                    params, opt_state, metrics, _ = step(
                        params, opt_state, fmask, raw, qs,
                        jnp.asarray(batch),
                        jax.random.fold_in(key, 31 * t + i), lw)
                return float(metrics["loss"])

            run_steps(0, 1)  # compile
            dts = []
            for t in range(1, 4):
                t0 = time.perf_counter()
                run_steps(t)
                dt = time.perf_counter() - t0
                if 3 * batch / dt < 100.0:  # > 100 pairs/s is implausible
                    dts.append(dt)
            if not dts:
                print(f"b{batch} remat={remat}: implausibly fast",
                      flush=True)
                continue
            dt = sorted(dts)[len(dts) // 2]
            print(f"b{batch} remat={remat}: "
                  f"{3 * batch / dt:.2f} pairs/s", flush=True)
        except Exception as e:
            print(f"b{batch} remat={remat}: FAILED "
                  f"{type(e).__name__}: {e}", flush=True)
        finally:
            jax.clear_caches()


def cmd_configs(args):
    for patches, batch, weighted, label in [
            (500, 16, False, "500p-uniform"),
            (500, 16, True, "500p-weighted-caps"),
            (5000, 2, False, "5000p")]:
        a = argparse.Namespace(**vars(args))
        a.patches, a.batch, a.weighted = patches, batch, weighted
        print(f"== {label}", flush=True)
        cmd_stages(a)


def cmd_variants(args):
    """Fused-inference rate for each ViT backbone variant the reference
    ships (get_B8/B16/L16_config, /root/reference/model/transformer.py) at
    the flagship 500-patch config. B8 quadruples the patch grid (8 px
    patches over the same uv space); L16 doubles width and depth."""
    from vtamiq_tpu.models.configs import (VIT_VARIANT_B8, VIT_VARIANT_B16,
                                           VIT_VARIANT_L16)
    for variant in (VIT_VARIANT_B16, VIT_VARIANT_B8, VIT_VARIANT_L16):
        vit = get_vit_config(variant, num_keep_layers=args.layers,
                             num_extra_tokens=8)
        cfg = VTAMIQConfig(vit=vit)
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        ecfg = ExtractConfig(patch_count=args.patches,
                             patch_dim=vit.patch_size,
                             norm_mean=(0.5 + SALT, 0.5, 0.5))
        extract = make_extract_fn(PatchSampler(), ecfg)

        def fused(params, raw, key, cfg=cfg, extract=extract,
                  attn_fn=infer_attention_fn(args.patches,
                                             batch_pairs=args.batch,
                                             num_heads=vit.num_heads,
                                             num_extra_tokens=vit.num_tokens)):
            patches, pos, scales = extract(raw, key)
            return jnp.sum(vtamiq_forward(params, cfg, patches, pos, scales,
                                          attention_fn=attn_fn))

        raw, key = fresh_raw(args.batch)
        run = loop_jit(fused, args.iters)
        float(run(params, raw, jax.random.fold_in(key, 9999)))
        timeit(lambda t: run(params, raw, jax.random.fold_in(key, t)),
               args.batch * args.iters, 5000.0,
               f"{variant} fused ({args.patches}p, keep {args.layers})")


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("cmd", choices=["stages", "extract", "attention", "train",
                                   "configs", "tune5000", "variants"])
    p.add_argument("--patches", type=int, default=None,
                   help="patch count (default: 5000 for tune5000 — the "
                        "command tunes the long-context config — else 500)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--layers", type=int, default=6)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--seq", type=int, default=0,
                   help="attention: token count override (default patches+9)")
    p.add_argument("--variant", default="B16", choices=["B16", "B8", "L16"],
                   help="ViT backbone for stages/train/tune5000 (round-4: "
                        "the flash blocks were tuned at 768/12h; L16 is "
                        "1024/16h — same head_dim 64, but verify)")
    p.add_argument("--weighted", action="store_true",
                   help="stratified (weighted) CAPS sampler")
    p.add_argument("--sweep", action="store_true",
                   help="attention: sweep flash block sizes")
    p.add_argument("--ab-backward", action="store_true",
                   help="train: A/B pallas vs recompute flash backward")
    p.add_argument("--grid", default="",
                   help="tune5000: override the stage-2 batch x remat grid "
                        "as comma-separated batch:remat legs, e.g. "
                        "'4:0,8:1,8:0' (remat 0/1); default is the built-in "
                        "4-leg grid")
    p.add_argument("--skip-stage1", action="store_true",
                   help="tune5000: skip the bwd-block sweep and go straight "
                        "to the batch x remat train grid with the committed "
                        "block defaults (stage 1 is head_dim-bound and the "
                        "defaults were tuned at d=64, shared by all variants)")
    args = p.parse_args()
    if args.patches is None:
        args.patches = 5000 if args.cmd == "tune5000" else 500
    print(f"device: {jax.devices()[0]}  seed: {SEED}", flush=True)
    {"stages": cmd_stages, "extract": cmd_extract, "attention": cmd_attention,
     "train": cmd_train, "configs": cmd_configs,
     "tune5000": cmd_tune5000, "variants": cmd_variants}[args.cmd](args)


if __name__ == "__main__":
    main()
