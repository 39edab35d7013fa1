"""Same-session A/B: quadratic XLA softmax vs Pallas flash FORWARD at 5000p.

Round-3 BENCH recorded infer_5000p = 27.0 pairs/s on the quadratic path
(bench.py then called vtamiq_forward without an attention_fn); after
f132783 gated the bench/profiler forwards on FLASH_ATTENTION_THRESHOLD the
same config read ~21 pairs/s. Those readings are from different relay days,
which this environment's variance makes incomparable (16-trial same-code
spread was 43-110 pairs/s — docs/regression_ab_r4.json), so this script
interleaves the two attention implementations trial-by-trial in ONE
session: drift and chip contention hit both arms equally and the RATIO is
trustworthy even when the absolute rates are not.

Arms (B16, 5000 patches, batch 2 pairs — the bench infer_5000p shape;
quadratic materializes fp32 logits [4,12,5120,5120] = 5.0 GB, fits alone):
  fused    sample -> extract -> forward (the bench row)
  fwd-only pre-extracted patches (localizes any delta to attention)

Reference scale anchor: /root/reference/modules/VisionTransformer/
transformer.py:158-164 materializes the full (S, S) attention — at S=5009
the torch-CPU baseline cannot run this config at all (BASELINE.md).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
from vtamiq_tpu.ops.attention import make_attention_fn
from vtamiq_tpu.ops.sampling import PatchSampler
from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn
from vtamiq_tpu.utils.benchharness import fresh_pair_batch

IMG_H, IMG_W = 384, 512
PATCHES = 5000
BATCH = 2
ITERS = 8
TRIALS = 5
BOUND = 200.0  # pairs/s physical ceiling at this shape (measured ~61% MFU
# forward is ~48 TFLOP/s ~ 27 pairs/s; 200 is a generous implausibility cut)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    cfg = VTAMIQConfig(vit=get_vit_config("B16", num_keep_layers=6,
                                          num_extra_tokens=8))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    sampler = PatchSampler()
    salt = (int(time.time_ns()) % 997) * 1e-13
    ecfg = ExtractConfig(patch_count=PATCHES, patch_dim=16,
                         norm_mean=(0.5 + salt, 0.5, 0.5))
    extract = make_extract_fn(sampler, ecfg)
    arms = {"quadratic": None, "flash": make_attention_fn()}

    def fused_loop(attn_fn):
        @jax.jit
        def run(params, raw, key):
            def body(i, acc):
                patches, pos, scales = extract(raw, jax.random.fold_in(key, i))
                return acc + jnp.sum(vtamiq_forward(
                    params, cfg, patches, pos, scales, attention_fn=attn_fn))
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((), jnp.float32))
        return run

    def fwd_loop(attn_fn):
        @jax.jit
        def run(params, patches, pos, scales, trial_salt):
            def body(i, acc):
                p_i = patches * (1.0 + trial_salt * 1e-6
                                 + i.astype(patches.dtype) * 1e-6)
                return acc + jnp.sum(vtamiq_forward(
                    params, cfg, p_i, pos, scales, attention_fn=attn_fn))
            return jax.lax.fori_loop(0, ITERS, body,
                                     jnp.zeros((), jnp.float32))
        return run

    raw, key = fresh_pair_batch(BATCH, IMG_H, IMG_W)
    patches, pos, scales = jax.jit(extract)(raw, key)
    pairs = BATCH * ITERS

    runners = {}
    for name, attn in arms.items():
        runners[f"fused/{name}"] = (fused_loop(attn), "fused")
        runners[f"fwd/{name}"] = (fwd_loop(attn), "fwd")

    # compile + flush the lying first post-compile result for every arm
    for label, (run, kind) in runners.items():
        t0 = time.perf_counter()
        if kind == "fused":
            float(run(params, raw, jax.random.fold_in(key, 9999)))
        else:
            float(run(params, patches, pos, scales, jnp.float32(-1.0)))
        print(f"warm {label}: {time.perf_counter() - t0:.1f}s", flush=True)

    times = {label: [] for label in runners}
    for t in range(TRIALS):
        for label, (run, kind) in runners.items():
            t0 = time.perf_counter()
            if kind == "fused":
                float(run(params, raw, jax.random.fold_in(key, 1000 * t + 7)))
            else:
                float(run(params, patches, pos, scales,
                          jnp.float32(1000 * t + 7)))
            dt = time.perf_counter() - t0
            rate = pairs / dt
            tag = ""
            if rate > BOUND:
                tag = "  [IMPLAUSIBLE, discarded]"
            else:
                times[label].append(dt)
            print(f"trial {t} {label}: {rate:.1f} pairs/s{tag}", flush=True)

    print("---- medians ----", flush=True)
    med = {}
    for label, dts in times.items():
        if not dts:
            print(f"{label}: no plausible trials", flush=True)
            continue
        dts = sorted(dts)
        med[label] = pairs / dts[len(dts) // 2]
        print(f"{label}: {med[label]:.1f} pairs/s "
              f"(n={len(dts)}, min={pairs / dts[-1]:.1f}, "
              f"max={pairs / dts[0]:.1f})", flush=True)
    for kind in ("fused", "fwd"):
        q, f = med.get(f"{kind}/quadratic"), med.get(f"{kind}/flash")
        if q and f:
            print(f"{kind}: quadratic/flash ratio = {q / f:.3f}", flush=True)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
