"""End-to-end A/B: int8-quantized encoder vs standard bf16 serving path.

Settles the int8 question at the only level that matters — the full fused
500-patch inference pipeline (sample -> extract -> forward), not an
isolated matmul. Arms run interleaved trial-by-trial in one session so
relay drift and chip contention hit both equally; the RATIO is the
readout. Protocol follows bench.py: time-based seeds, program salt,
iteration-dependent fori_loop bodies, float() completion barriers, and a
physical-plausibility filter.

Context: tools/int8_probe.py (matmul level) read int8_dyn 1.23x / static
0.86x — contradictory; the round-2 isolated-matmul probe read parity.
This measures what a user of VTAMIQScorer(quantize_int8=True) gets.

v2 (after the first run read an impossible 5.4x while a training job
shared the chip): adds an A/A CONTROL — the bf16 program runs as two arms
with their own jit instances — and rotates arm order each trial. If the
two bf16 arms disagree, or an arm's reading tracks its slot rather than
its program, the harness (relay queueing/memoization) is the artifact and
the trial set is invalid. Run on an otherwise-idle chip.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vtamiq_tpu.models.configs import VTAMIQConfig, get_vit_config
from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
from vtamiq_tpu.ops.sampling import PatchSampler
from vtamiq_tpu.ops.quant import quantize_params_int8, count_quantized_leaves
from vtamiq_tpu.train.steps import ExtractConfig, make_extract_fn

BATCH, PATCHES, IMG_H, IMG_W = 16, 500, 384, 512
ITERS = 50
TRIALS = 6
IMPLAUSIBLE_PAIRS_PER_SEC = 5000.0
MIN_DT = BATCH * ITERS / IMPLAUSIBLE_PAIRS_PER_SEC


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    qparams = dict(params)
    qparams["vit"] = quantize_params_int8(params["vit"])
    print(f"quantized leaves: {count_quantized_leaves(qparams['vit'])}",
          flush=True)

    def make_pipeline(arm_salt):
        # each arm gets its own program salt -> its own executable, so the
        # relay cannot serve one arm's (program, inputs) memo to another
        ecfg = ExtractConfig(patch_count=PATCHES, patch_dim=16,
                             norm_mean=(0.5 + arm_salt, 0.5, 0.5))
        extract = make_extract_fn(PatchSampler(), ecfg)

        @jax.jit
        def pipeline_n(p, imgs_raw, key):
            def body(i, acc):
                patches, pos, scales = extract(imgs_raw,
                                               jax.random.fold_in(key, i))
                q = vtamiq_forward(p, cfg, patches, pos, scales)
                return acc + jnp.sum(q)
            return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))
        return pipeline_n

    base_salt = (int(time.time_ns()) % 997) * 1e-13

    def fresh_inputs():
        s = int(time.time_ns()) & 0x7FFFFFFF
        r = np.random.default_rng(s)
        return (jnp.asarray(r.uniform(0, 1, (BATCH, 2, IMG_H, IMG_W, 3)),
                            jnp.float32), jax.random.PRNGKey(s))

    arms = [("bf16_a", params, make_pipeline(base_salt)),
            ("int8", qparams, make_pipeline(base_salt + 1e-13)),
            ("bf16_b", params, make_pipeline(base_salt + 2e-13))]
    raw0, key0 = fresh_inputs()
    for name, p, fn in arms:
        t0 = time.perf_counter()
        v = float(fn(p, raw0, jax.random.fold_in(key0, 999)))
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s (sum={v:.4f})",
              flush=True)

    times = {name: [] for name, _, _ in arms}
    for t in range(TRIALS):
        raw_t, key_t = fresh_inputs()
        # settle the ~75 MB host->device input transfer BEFORE timing any
        # arm: jnp.asarray copies asynchronously and the first consumer
        # blocks on it — v2's A/A control measured the first-slot arm 2.7x
        # slower from exactly this (bf16_a/bf16_b 0.371, 2026-08-19 log)
        float(jnp.sum(raw_t))
        order = [arms[(t + j) % len(arms)] for j in range(len(arms))]
        for name, p, fn in order:
            t0 = time.perf_counter()
            float(fn(p, raw_t, jax.random.fold_in(key_t, t)))
            dt = time.perf_counter() - t0
            pps = BATCH * ITERS / dt
            tag = ""
            if dt < MIN_DT:
                tag = "  [IMPLAUSIBLE, discarded]"
            else:
                times[name].append(dt)
            print(f"trial {t} {name}: {dt:.2f}s = {pps:.1f} pairs/s{tag}",
                  flush=True)

    print("---- medians ----", flush=True)
    med = {}
    for name, dts in times.items():
        if not dts:
            print(f"{name}: no plausible trials", flush=True)
            continue
        dts = sorted(dts)
        m = dts[len(dts) // 2]
        med[name] = m
        print(f"{name}: {BATCH * ITERS / m:.1f} pairs/s median "
              f"({BATCH * ITERS / dts[-1]:.1f}-{BATCH * ITERS / dts[0]:.1f}, "
              f"n={len(dts)})", flush=True)
    if "bf16_a" in med and "bf16_b" in med:
        aa = med["bf16_a"] / med["bf16_b"]
        print(f"A/A control bf16_a/bf16_b: {aa:.3f} "
              f"(outside 0.9-1.1 => harness artifact, discard the run)",
              flush=True)
        if "int8" in med:
            bf16 = (med["bf16_a"] + med["bf16_b"]) / 2
            print(f"int8 speedup over mean bf16: {bf16 / med['int8']:.3f}x",
                  flush=True)
    print("AB DONE", flush=True)


if __name__ == "__main__":
    main()
