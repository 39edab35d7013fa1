"""Probe: does int8 x int8 -> int32 dot_general beat bf16 on this chip?

v5e's MXU runs int8 at ~2x the bf16 rate (394 vs 197 TOPS peak), so a
quantized serving path could lift the headline inference throughput past
the measured bf16 practical ceiling (docs/OPERATIONS.md, 78.5 TFLOP/s
isolated matmul). Before building that path, this probe times the two
matmul dtypes interleaved trial-by-trial in one session (relay drift and
contention hit both arms equally; the RATIO is the readout).

Shape matches the ViT encoder hot matmul family: (rows, 768) x (768, 768)
with rows ~ B*S of the fused 500p config. Each loop iteration feeds the
previous output back in (iteration-dependent, defeats XLA LICM and the
relay's (program, inputs) memo).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ROWS = 8192
DIM = 768
ITERS = 200
TRIALS = 5
FLOPS = 2.0 * ROWS * DIM * DIM * ITERS
# one matmul at these shapes is ~9.7 GFLOP; 200 iters ~ 1.9 TFLOP.
# plausibility: nothing on this chip exceeds 400 TOPS.
MIN_SECONDS = FLOPS / 400e12


def bf16_loop():
    @jax.jit
    def run(x, w):
        def body(i, acc):
            y = jnp.dot(acc, w, preferred_element_type=jnp.float32)
            # renormalize so values stay finite across 200 iterations
            y = y / (jnp.max(jnp.abs(y)) + 1e-6)
            return y.astype(jnp.bfloat16)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x).astype(jnp.float32))
    return run


def int8_loop():
    @jax.jit
    def run(x, w_q8, w_scale):
        def body(i, acc):
            # dynamic per-row activation quantization (the serving path's
            # exact recipe): amax -> int8 -> int32 dot -> dequant
            amax = jnp.max(jnp.abs(acc), axis=-1, keepdims=True) + 1e-6
            x_q8 = jnp.round(acc / amax * 127.0).astype(jnp.int8)
            y32 = jax.lax.dot_general(
                x_q8, w_q8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y32.astype(jnp.float32) * (amax / 127.0) * w_scale[None, :]
            y = y / (jnp.max(jnp.abs(y)) + 1e-6)
            return y.astype(jnp.float32)
        return jnp.sum(jax.lax.fori_loop(0, ITERS, body, x))
    return run


def int8_static_loop():
    """int8 with PRE-quantized activations (upper bound: no quant overhead)."""
    @jax.jit
    def run(x_q8, w_q8):
        def body(i, acc):
            y32 = jax.lax.dot_general(
                acc, w_q8, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # cheap requant keeping iteration-dependence
            y = (y32 >> 12).astype(jnp.int8)
            return y
        out = jax.lax.fori_loop(0, ITERS, body, x_q8)
        return jnp.sum(out.astype(jnp.int32))
    return run


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    seed = int(time.time_ns()) % (2**31)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((ROWS, DIM)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((DIM, DIM)) * 0.02, jnp.float32)
    w_scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    w_q8 = jnp.round(w / w_scale[None, :]).astype(jnp.int8)
    x_q8 = jnp.round(jnp.clip(x, -3, 3) / 3.0 * 127.0).astype(jnp.int8)

    arms = {
        "bf16": (bf16_loop(), lambda s: (x.astype(jnp.bfloat16) * (1 + s * 1e-6), w.astype(jnp.bfloat16))),
        "int8_dyn": (int8_loop(), lambda s: (x * (1 + s * 1e-6), w_q8, w_scale)),
        "int8_static": (int8_static_loop(),
                        lambda s: (jnp.roll(x_q8, s, axis=0), w_q8)),
    }

    for name, (run, mk) in arms.items():
        t0 = time.perf_counter()
        float(run(*mk(-1)))
        print(f"warm {name}: {time.perf_counter() - t0:.1f}s", flush=True)

    times = {n: [] for n in arms}
    for t in range(TRIALS):
        for name, (run, mk) in arms.items():
            args = mk(t + 1)
            t0 = time.perf_counter()
            float(run(*args))
            dt = time.perf_counter() - t0
            tflops = FLOPS / dt / 1e12
            tag = ""
            if dt < MIN_SECONDS:
                tag = "  [IMPLAUSIBLE, discarded]"
            else:
                times[name].append(dt)
            print(f"trial {t} {name}: {dt * 1e3:.1f} ms  {tflops:.1f} TOP/s{tag}",
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
        print(f"{name}: {m * 1e3:.1f} ms = {FLOPS / m / 1e12:.1f} TOP/s "
              f"(n={len(dts)})", flush=True)
    if "bf16" in med:
        for name in ("int8_dyn", "int8_static"):
            if name in med:
                print(f"{name} speedup over bf16: {med['bf16'] / med[name]:.3f}x",
                      flush=True)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
