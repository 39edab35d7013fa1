"""Benchmark: VTAMIQ dual-tower inference throughput on the default JAX device.

Measures ref/dist image-pairs/sec for the BASELINE.json headline config
(ViT-B/16, 6 kept layers, 8 register tokens, 500x16x16 patches per image,
full on-device pipeline: CAPS sampling -> patch gather -> dual-tower ViT ->
DiffNet -> q), and compares against a PyTorch-CPU baseline of the same
architecture (the reference's deployment target is a single device running
torch; BASELINE.md north star: >=10x torch-CPU pairs/sec per v5e chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/sec", "vs_baseline": N}

The torch-CPU baseline is measured once and cached in .bench_torch_cpu.json
(same-machine hardware constant; delete the file to re-measure).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BATCH = 16
PATCHES = 500
IMG_H, IMG_W = 384, 512  # TID2013-like input
WARMUP = 1
ITERS = 60
CACHE = os.path.join(REPO, ".bench_torch_cpu.json")

# v5e bf16 peak (per chip) for analytic-MFU rows
PEAK_FLOPS = 197e12

# 5000-patch train batch: the tune5000 production point (tools/profiler.py).
# Round-4 sweep (same chip, concurrent-load relative A/B): b8 no-remat 6.39
# pairs/s vs b4 no-remat 3.68 vs b8 remat 5.42 — batch 8 fills the MXU the
# fused Pallas backward leaves idle at b4. The IDLE-chip sizes are smaller
# than that contended ratio suggests: round-3 bench read b4 5.92 and
# round-4 read b8 7.22, i.e. b8 is ~1.22x b4 idle (the 1.74x in the sweep
# log was amplified by the concurrent parity job). b8 remains the winner.
TRAIN_5000P_BATCH = 8


def _enable_compile_cache():
    """DISABLED: executables loaded from the persistent XLA compile cache
    "execute" on this tunneled TPU service WITHOUT running (instant returns,
    nonsense timings — every process that compiled measured sanely; every
    process that cache-loaded measured ~760k pairs/s). The one-time compile
    (~15 s pipeline, ~1-3 min train step) is the price of real numbers."""
    return


def measure_jax():
    import jax
    import jax.numpy as jnp
    _enable_compile_cache()
    from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
    from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
    from vtamiq_tpu.ops.sampling import PatchSampler
    from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    sampler = PatchSampler()  # shipped config: uniform stratified (PERTURBED_SIMPLE)

    # PROGRAM salt: the TPU service memoizes executions by compiled-program
    # fingerprint (observed to replay results for fresh inputs). A per-run
    # constant baked into the normalization constants gives every bench run
    # a unique executable at numerically-negligible cost (eps ~ 1e-10).
    salt = (int(time.time_ns()) % 997) * 1e-13
    ecfg = ExtractConfig(patch_count=PATCHES, patch_dim=16,
                         norm_mean=(0.5 + salt, 0.5, 0.5))
    extract = make_extract_fn(sampler, ecfg)

    def pipeline(params, imgs_raw, key):
        patches, pos, scales = extract(imgs_raw, key)
        return vtamiq_forward(params, cfg, patches, pos, scales)

    # run ITERS batches inside ONE jitted fori_loop: a single host dispatch,
    # so the measurement is device throughput, not controller round-trips
    # (this environment tunnels dispatches through a relay with high latency)
    @jax.jit
    def pipeline_n(params, imgs_raw, key):
        def body(i, acc):
            q = pipeline(params, imgs_raw, jax.random.fold_in(key, i))
            return acc + jnp.sum(q)
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    # fallback: the same work split into two dispatches per iteration
    # (extract, then forward). The single fused executable intermittently
    # hits a device/compiler fault on this environment's TPU service; the
    # split stages are reliable and measure the same device work.
    extract_j = jax.jit(lambda r, k: extract(r, k))
    forward_j = jax.jit(
        lambda p, x, uv, s: vtamiq_forward(p, cfg, x, uv, s)
        + jnp.float32(salt))  # program-salted like the fused pipeline

    def split_run(params, raw, key, iters):
        for i in range(iters):
            patches, pos, scales = extract_j(raw, jax.random.fold_in(key, i))
            q = forward_j(params, patches, pos, scales)
        return float(q[0])  # host transfer = the only reliable completion barrier

    # time-based seed: this environment's TPU service memoizes executions by
    # (program, inputs) across processes — a fixed seed would replay a cached
    # result instantly and report nonsense throughput
    seed = int(time.time()) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    raw = jnp.asarray(rng.uniform(0, 1, (BATCH, 2, IMG_H, IMG_W, 3)), jnp.float32)
    key = jax.random.PRNGKey(seed)

    # single-chip physical ceiling: the forward alone is ~97 GFLOP/pair;
    # v5e peak 197 TFLOPS bf16 => < 2040 pairs/s even at 100% MFU. Faster
    # readings mean the relay served results without executing (a transient
    # service state observed even for fresh (program, inputs)); such trials
    # are rejected, and after an all-replayed round the bench re-draws FRESH
    # input data and sleeps to let the service state pass.
    IMPLAUSIBLE_PAIRS_PER_SEC = 5000.0
    min_dt = BATCH * ITERS / IMPLAUSIBLE_PAIRS_PER_SEC

    def fresh_inputs():
        s = int(time.time_ns()) & 0x7FFFFFFF
        r = np.random.default_rng(s)
        raw_f = jnp.asarray(r.uniform(0, 1, (BATCH, 2, IMG_H, IMG_W, 3)),
                            jnp.float32)
        # settle the async host->device copy so the first timed trial
        # doesn't absorb it (~4.5 s for 75 MB; see utils/benchharness.py)
        float(raw_f.ravel()[0])
        return raw_f, jax.random.PRNGKey(s)

    def timed_trials(make_fn, n_trials=3, max_rounds=4, sleep_s=45.0):
        """Sorted list of n plausible timings; each round uses fresh random
        images + keys; implausibly fast (non-executed) trials are discarded
        and the round repeats after a cool-down."""
        times = []
        for round_ in range(max_rounds):
            raw_r, key_r = fresh_inputs()
            fn = make_fn(raw_r)
            for t in range(n_trials):
                t0 = time.perf_counter()
                float(fn(jax.random.fold_in(key_r, t)))  # see barrier note
                dt = time.perf_counter() - t0
                if dt >= min_dt:
                    times.append(dt)
            if len(times) >= n_trials:
                return sorted(times)
            print(f"bench: round {round_}: implausibly-fast trials discarded "
                  f"(relay served without executing); cooling down "
                  f"{sleep_s:.0f}s and re-drawing fresh inputs", file=sys.stderr)
            time.sleep(sleep_s)
        if times:
            return sorted(times)
        raise RuntimeError("all timed trials implausibly fast (relay replay)")

    try:
        # warmup: FORCE the scalar to host — on this tunneled service,
        # block_until_ready on the first post-compile result returns
        # immediately while the execution is still queued (measured: block
        # 0.000s, then float() waited 97s); only a device->host transfer
        # reliably barriers. All timed consumption below uses float().
        float(pipeline_n(params, raw, jax.random.fold_in(key, 1000)))
        dts = timed_trials(lambda raw_r: (lambda k: pipeline_n(params, raw_r, k)))
        dt = dts[len(dts) // 2]
        headline_spread = {
            "min": round(BATCH * ITERS / dts[-1], 3),
            "max": round(BATCH * ITERS / dts[0], 3), "trials": len(dts)}
    except Exception as e:
        print(f"fused pipeline failed ({type(e).__name__}); "
              f"falling back to split stages", file=sys.stderr)
        headline_spread = None  # single split-stage reading, no spread
        split_run(params, raw, key, 2)  # warmup/compile
        dt = None
        for attempt in range(3):
            raw_r, key_r = fresh_inputs()
            t0 = time.perf_counter()
            split_run(params, raw_r, key_r, ITERS)
            dt = time.perf_counter() - t0
            if dt >= min_dt:
                break
            dt = None
            print("bench: split-stage trial also implausibly fast; "
                  "cooling down 45s", file=sys.stderr)
            time.sleep(45.0)
        if dt is None:
            # CLAUDE.md rule 5: never report a physically-implausible reading
            raise RuntimeError(
                "all split-stage trials implausibly fast (relay replay)")

    pairs_per_sec = BATCH * ITERS / dt

    # full fused TRAIN step rate (sampling -> extraction -> fwd/bwd -> AdamW),
    # reported as an extra metric (VERDICT r01 item 2)
    train_pairs_per_sec = None
    try:
        import optax
        from vtamiq_tpu.train.steps import make_train_step
        from vtamiq_tpu.train.optim import build_freeze_mask
        from vtamiq_tpu.ops.losses import loss_func_iqa  # noqa: F401 (warm import)
        optimizer = optax.adamw(5e-5, weight_decay=0.01)
        t_params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        opt_state = optimizer.init(t_params)
        mask = build_freeze_mask(t_params, False, None)
        step = make_train_step(cfg, sampler, ecfg, optimizer)  # ecfg: salted
        qs = jnp.asarray(rng.uniform(0, 1, (BATCH,)), jnp.float32)
        valid = jnp.asarray(BATCH)
        lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)

        def run_steps(k, n):
            nonlocal t_params, opt_state
            for i in range(n):
                t_params, opt_state, metrics, _ = step(
                    t_params, opt_state, mask, raw, qs, valid,
                    jax.random.fold_in(k, i), lw)
            return float(metrics["loss"])  # host-transfer barrier

        run_steps(jax.random.fold_in(key, 2000), 1)  # compile
        n_train = 10
        # train fwd+bwd is ~3x the forward FLOPs: ceiling < 700 pairs/s
        train_bound = 1500.0
        times = []
        for t in range(6):
            t0 = time.perf_counter()
            run_steps(jax.random.fold_in(key, 3000 + t), n_train)
            dt_t = time.perf_counter() - t0
            if BATCH * n_train / dt_t < train_bound:
                times.append(dt_t)
            if len(times) == 3:
                break
        if times:
            times.sort()
            train_pairs_per_sec = BATCH * n_train / times[len(times) // 2]
            train_spread = {
                "min": round(BATCH * n_train / times[-1], 3),
                "max": round(BATCH * n_train / times[0], 3),
                "trials": len(times)}
        else:
            train_spread = None
    except Exception as e:
        train_spread = None
        print(f"train-step bench failed: {type(e).__name__}: {e}", file=sys.stderr)

    device = str(jax.devices()[0])
    return (pairs_per_sec, headline_spread, train_pairs_per_sec,
            train_spread, device)


def measure_extra_configs(budget_s: float = 1500.0):
    """Non-headline tracked configs, machine-readable (VERDICT r02 item 6):
    weighted-CAPS inference, 5000-patch inference + train (Pallas flash
    fwd+bwd), and serving p50/p99. Each config is independent — a failure
    records an "error" entry instead of killing the bench — and a wall-time
    budget skips remaining configs on slow-compile days (the remote compile
    service has 10-20 min/program days; the headline must never be hostage
    to the extras). Override with BENCH_EXTRA_BUDGET_S."""
    budget_s = float(os.environ.get("BENCH_EXTRA_BUDGET_S", budget_s))
    t_start = time.time()

    def over_budget(name, results):
        if time.time() - t_start > budget_s:
            results[name] = {"skipped": f"extra-config time budget "
                                        f"({budget_s:.0f}s) exhausted"}
            return True
        return False
    import jax
    import jax.numpy as jnp
    from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
    from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
    from vtamiq_tpu.ops.sampling import (PatchSampler, GRID_TYPE_PERTURBED,
                                         DIFF_TYPE_MAGNITUDE)
    from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    salt = (int(time.time_ns()) % 997) * 1e-13
    results = {}

    # one shared implementation of the fresh-inputs + plausibility-filtered
    # median methodology (also used by tools/profiler.py). Round-4: every
    # row carries {median, min, max, trials} (VERDICT r03 item 3 — single
    # readings can't be told apart from relay noise round-over-round) plus
    # an analytic-FLOPs MFU lower bound (model matmuls only; extraction,
    # sampling, and optimizer work aren't counted, so true utilization is
    # higher than the printed figure).
    from vtamiq_tpu.utils.benchharness import fresh_pair_batch, timed_stats
    from vtamiq_tpu.models.utils import vtamiq_flops

    def fresh(batch, seed_extra=0):
        return fresh_pair_batch(batch, IMG_H, IMG_W, seed_extra)

    def row(stats, flops_per_pair):
        out = {k: (round(v, 3) if k != "trials" else v)
               for k, v in stats.items()}
        out["mfu"] = round(stats["median"] * flops_per_pair / PEAK_FLOPS, 4)
        return out

    def fused_infer(sampler, ecfg, batch, iters, bound, params_arg=None):
        run_params = params if params_arg is None else params_arg
        extract = make_extract_fn(sampler, ecfg)
        # measured per-(variant, S, batch) choice (tools/ab_infer5000.py,
        # idle chip: B16 5000p b2 quadratic beats flash 1.31x fused; flash
        # stays for whatever exceeds the logits budget, e.g. L16 5000p)
        from vtamiq_tpu.ops.attention import choose_attention_fn
        attn_fn = choose_attention_fn(ecfg.patch_count, train=False,
                                      batch_pairs=batch,
                                      num_heads=cfg.vit.num_heads,
                                      num_extra_tokens=cfg.vit.num_tokens)

        @jax.jit
        def loop(params, raw, key):
            def body(i, acc):
                patches, pos, scales = extract(raw, jax.random.fold_in(key, i))
                return acc + jnp.sum(vtamiq_forward(params, cfg, patches, pos,
                                                    scales,
                                                    attention_fn=attn_fn))
            return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

        raw, key = fresh(batch)
        float(loop(run_params, raw, jax.random.fold_in(key, 999)))  # compile
        stats = timed_stats(
            lambda t: loop(run_params, raw, jax.random.fold_in(key, t)),
            batch * iters, bound)
        return row(stats, vtamiq_flops(cfg, ecfg.patch_count))

    def fused_train(sampler, ecfg, batch, n_steps, bound, seed_extra=0):
        """Shared train-step row: sampling -> extraction -> fwd/bwd -> AdamW.
        fwd+bwd ~ 3x the forward FLOPs for the MFU bound."""
        import optax
        from vtamiq_tpu.train.steps import make_train_step
        from vtamiq_tpu.train.optim import build_freeze_mask
        optimizer = optax.adamw(5e-5, weight_decay=0.01)
        t_params = init_vtamiq_params(jax.random.PRNGKey(1), cfg)
        opt_state = optimizer.init(t_params)
        mask = build_freeze_mask(t_params, False, None)
        step = make_train_step(cfg, sampler, ecfg, optimizer)
        raw, key = fresh(batch, seed_extra)
        rng = np.random.default_rng(int(time.time()) & 0x7FFFFFFF)
        qs = jnp.asarray(rng.uniform(0, 1, (batch,)), jnp.float32)
        lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)

        def run_steps(k, n):
            nonlocal t_params, opt_state
            for i in range(n):
                t_params, opt_state, metrics, _ = step(
                    t_params, opt_state, mask, raw, qs, jnp.asarray(batch),
                    jax.random.fold_in(k, i), lw)
            return float(metrics["loss"])

        run_steps(jax.random.fold_in(key, 77), 1)  # compile
        stats = timed_stats(
            lambda t: run_steps(jax.random.fold_in(key, 100 + t), n_steps)
            or 1.0, batch * n_steps, bound)
        return row(stats, 3 * vtamiq_flops(cfg, ecfg.patch_count))

    # -- weighted-CAPS inference (stratified PERTURBED + magnitude diff) --
    try:
        if over_budget("infer_500p_weighted_caps", results):
            raise StopIteration
        sampler_w = PatchSampler(diff_weight=1.0, uniform_weight=0.1,
                                 grid_type=GRID_TYPE_PERTURBED,
                                 diff_type=DIFF_TYPE_MAGNITUDE)
        ecfg_w = ExtractConfig(patch_count=PATCHES, patch_dim=16,
                               norm_mean=(0.5 + salt, 0.5, 0.5))
        results["infer_500p_weighted_caps"] = fused_infer(
            sampler_w, ecfg_w, BATCH, 30, bound=5000.0)
    except StopIteration:
        pass  # budget skip already recorded
    except Exception as e:
        results["infer_500p_weighted_caps"] = {"error": f"{type(e).__name__}: {e}"}

    # -- weighted-CAPS TRAIN (the one tracked config the round-3 bench
    # missed — the 123.8 -> 115.2 pairs/s regression was invisible to the
    # machine-readable record; VERDICT r03 item 3) --
    try:
        if over_budget("train_weighted_caps", results):
            raise StopIteration
        results["train_weighted_caps"] = fused_train(
            sampler_w, ecfg_w, BATCH, 5, bound=1500.0, seed_extra=2)
    except StopIteration:
        pass  # budget skip already recorded
    except Exception as e:
        results["train_weighted_caps"] = {"error": f"{type(e).__name__}: {e}"}

    # -- 5000-patch long-context config (Pallas flash attention) --
    sampler_u = PatchSampler()
    ecfg_5k = ExtractConfig(patch_count=5000, patch_dim=16,
                            norm_mean=(0.5 + salt, 0.5, 0.5))
    try:
        if over_budget("infer_5000p", results):
            raise StopIteration
        results["infer_5000p"] = fused_infer(sampler_u, ecfg_5k, 2, 8,
                                             bound=150.0)
    except StopIteration:
        pass  # budget skip already recorded
    except Exception as e:
        results["infer_5000p"] = {"error": f"{type(e).__name__}: {e}"}

    try:
        if over_budget("train_5000p", results):
            raise StopIteration
        results["train_5000p"] = fused_train(
            sampler_u, ecfg_5k, TRAIN_5000P_BATCH, 5, bound=80.0,
            seed_extra=1)
    except StopIteration:
        pass  # budget skip already recorded
    except Exception as e:
        results["train_5000p"] = {"error": f"{type(e).__name__}: {e}"}

    # -- int8 W8A8 serving inference (opt-in quantized path; VERDICT r4 #6:
    # the ~5% claim and rank-faithfulness live in ops/quant.py's ledger and
    # docs/int8_accuracy_r5.json — this row puts the throughput into the
    # machine-readable record; expect ~= bf16 + ~5% from weight HBM
    # traffic). Runs AFTER the tracked 5000p rows so a slow-compile day
    # budget-skips this opt-in row, not the round-over-round ones. --
    try:
        if over_budget("infer_500p_int8", results):
            raise StopIteration
        from vtamiq_tpu.ops.quant import quantize_params_int8
        params_q8 = dict(params)
        params_q8["vit"] = quantize_params_int8(params["vit"])
        ecfg_u8 = ExtractConfig(patch_count=PATCHES, patch_dim=16,
                                norm_mean=(0.5 + salt, 0.5, 0.5))
        results["infer_500p_int8"] = fused_infer(
            PatchSampler(), ecfg_u8, BATCH, 30, bound=5000.0,
            params_arg=params_q8)
    except StopIteration:
        pass  # budget skip already recorded
    except Exception as e:
        results["infer_500p_int8"] = {"error": f"{type(e).__name__}: {e}"}

    # -- serving latency (MicroBatcher, warmed shape, sequential clients) --
    try:
        if over_budget("serving_latency", results):
            raise StopIteration
        from vtamiq_tpu.inference import VTAMIQScorer
        from vtamiq_tpu.serving import MicroBatcher
        scorer = VTAMIQScorer(params=params, cfg=cfg, patch_count=PATCHES,
                              seed=int(time.time()) & 0x7FFFFFFF)
        mb = MicroBatcher(scorer, max_batch=4, max_wait_ms=2.0).start()
        try:
            mb.warmup(IMG_H, IMG_W)
            r = np.random.default_rng(int(time.time()) & 0x7FFFFFFF)
            lat = []
            for i in range(40):
                ref = r.uniform(0, 1, (IMG_H, IMG_W, 3)).astype(np.float32)
                dist = np.clip(ref + r.normal(0, 0.05, ref.shape), 0, 1
                               ).astype(np.float32)
                t0 = time.perf_counter()
                mb.score(ref, dist, timeout=30.0)
                lat.append((time.perf_counter() - t0) * 1000)
            lat.sort()
            # single sequential client: steady-state latency, not throughput
            results["serving_p50_ms"] = round(lat[len(lat) // 2], 1)
            results["serving_p99_ms"] = round(lat[min(len(lat) - 1,
                                                      int(len(lat) * 0.99))], 1)
            # distribution detail so round-over-round percentile deltas can
            # be judged against within-run spread (VERDICT r03 items 3/7)
            results["serving_lat_ms"] = {
                "min": round(lat[0], 1), "max": round(lat[-1], 1),
                "mean": round(sum(lat) / len(lat), 1),
                "p90": round(lat[int(len(lat) * 0.90)], 1), "n": len(lat),
                "protocol": "1 sequential client, 40 requests, "
                            "warmed 384x512 shape, MicroBatcher max_batch=4"}
        finally:
            mb.stop()
    except StopIteration:
        pass  # budget skip already recorded
    except Exception as e:
        results["serving_latency"] = {"error": f"{type(e).__name__}: {e}"}

    return results


def measure_torch_cpu_baseline():
    """Equivalent-architecture dual-tower forward in PyTorch on CPU.

    Self-contained minimal implementation (ViT-B/16 @ 6 layers + channel-
    attention head) matching the reference's compute graph; patches are
    pre-extracted on the host as the reference does in DataLoader workers,
    and extraction cost is excluded (favoring the baseline)."""
    if os.path.isfile(CACHE):
        with open(CACHE) as f:
            return json.load(f)["pairs_per_sec"]
    import torch
    import torch.nn as nn
    torch.set_num_threads(os.cpu_count() or 1)

    H, MLP, HEADS, LAYERS, T = 768, 3072, 12, 6, 9

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln1 = nn.LayerNorm(H, eps=1e-6)
            self.attn = nn.MultiheadAttention(H, HEADS, batch_first=True)
            self.ls1 = nn.Parameter(torch.ones(H))
            self.ln2 = nn.LayerNorm(H, eps=1e-6)
            self.mlp = nn.Sequential(nn.Linear(H, MLP), nn.GELU(), nn.Linear(MLP, H))
            self.ls2 = nn.Parameter(torch.ones(H))

        def forward(self, x):
            h = self.ln1(x)
            x = x + self.ls1 * self.attn(h, h, h, need_weights=False)[0]
            x = x + self.ls2 * self.mlp(self.ln2(x))
            return x

    class Tower(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Linear(768, H)
            self.pos = nn.Embedding(577, H)
            self.tokens = nn.Parameter(torch.zeros(T, H))
            self.blocks = nn.ModuleList([Block() for _ in range(LAYERS)])
            self.ln = nn.LayerNorm(H, eps=1e-6)

        def forward(self, patches, pos_idx):
            x = self.embed(patches) + self.pos(pos_idx)
            x = torch.cat([self.tokens.expand(x.shape[0], T, H), x], dim=1)
            for b in self.blocks:
                x = b(x)
            return self.ln(x)[:, 0]

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            for _ in range(4 * 4):  # 4 RGs x 4 RCABs
                layers.append(nn.Sequential(nn.Linear(H, H), nn.Linear(H, 48),
                                            nn.ReLU(), nn.Linear(48, H)))
            self.rcabs = nn.ModuleList(layers)
            self.out = nn.Sequential(nn.Linear(H, H), nn.Linear(H, 192),
                                     nn.PReLU(), nn.Linear(192, 1))

        def forward(self, d):
            for m in self.rcabs:
                z = m[0](d)
                d = d + z * torch.sigmoid(m[3](m[2](m[1](z))))
            return self.out(d)

    tower, head = Tower().eval(), Head().eval()
    rng = np.random.default_rng(0)
    patches = torch.from_numpy(rng.normal(size=(BATCH, PATCHES, 768)).astype(np.float32))
    pos_idx = torch.from_numpy(rng.integers(1, 577, size=(BATCH, PATCHES)))

    def run_pair():
        with torch.no_grad():
            cls_r = tower(patches, pos_idx)
            cls_d = tower(patches, pos_idx)
            return head(cls_r - cls_d)

    run_pair()  # warmup
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run_pair()
    dt = time.perf_counter() - t0
    pairs_per_sec = BATCH * iters / dt
    with open(CACHE, "w") as f:
        json.dump({"pairs_per_sec": pairs_per_sec, "threads": torch.get_num_threads(),
                   "measured_at": time.time()}, f)
    return pairs_per_sec


def main():
    headline_only = "--headline-only" in sys.argv
    value, spread, train_value, train_spread, device = measure_jax()
    try:
        baseline = measure_torch_cpu_baseline()
    except Exception as e:
        print(f"torch baseline failed: {e}", file=sys.stderr)
        baseline = None
    vs = (value / baseline) if baseline else -1.0
    out = {
        "metric": f"VTAMIQ ref/dist image pairs/sec ({device}; ViT-B/16 6L, "
                  f"{PATCHES} patches, batch {BATCH}, full on-device pipeline)",
        "value": round(value, 3),
        "unit": "pairs/sec",
        "vs_baseline": round(vs, 3),
    }
    from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
    from vtamiq_tpu.models.utils import vtamiq_flops
    fl = vtamiq_flops(VTAMIQConfig(vit=get_vit_config(
        num_keep_layers=6, num_extra_tokens=8)), PATCHES)
    out["mfu"] = round(value * fl / PEAK_FLOPS, 4)
    if spread is not None:
        out["spread"] = spread
    if train_value is not None:
        out["train_pairs_per_sec"] = round(train_value, 3)
        out["train_mfu"] = round(train_value * 3 * fl / PEAK_FLOPS, 4)
        if train_spread is not None:
            out["train_spread"] = train_spread
    if not headline_only:
        try:
            out["configs"] = measure_extra_configs()
        except Exception as e:
            print(f"extra-config bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
