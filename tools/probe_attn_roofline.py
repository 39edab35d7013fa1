"""Measure the PRACTICAL MXU roofline for attention-shaped matmuls.

The 5000p train step's analytic MFU (~0.20) counts FLOPs against the
chip's 197 TFLOP/s bf16 peak, but flash attention's per-tile matmuls
contract over K=D=64 — far thinner than the 128-deep MXU pipeline likes.
This probe times isolated matmul chains at the exact shapes the flash
kernels issue, plus the dense-encoder shape as a control (round-2 measured
78.5 TFLOP/s ~ 40% there), so train_5000p's MFU can be judged against the
achievable ceiling rather than the nameplate.

Chains are iteration-dependent (fold i into the data) per CLAUDE.md
round-3: XLA LICM hoists loop-invariant bodies and the relay memoizes
(program, inputs).

Usage: nohup python tools/probe_attn_roofline.py > /tmp/probe_attn.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    def time_matmul(m, k, n, iters=50, trials=4, tag=""):
        """Chained A@B keeping shapes static; i-dependent perturbation."""
        key = jax.random.PRNGKey(int(time.time_ns()) & 0x7FFFFFFF)
        a = jax.random.normal(key, (m, k), jnp.bfloat16)
        b = jax.random.normal(jax.random.fold_in(key, 1), (k, n),
                              jnp.bfloat16)
        c0 = jax.random.normal(jax.random.fold_in(key, 2), (m, n),
                               jnp.bfloat16)

        @jax.jit
        def chain(a, b, c, t):
            def body(i, c):
                # fold the loop index in: d = A@B + eps(i) * C; consume via c
                d = jnp.dot(a, b, preferred_element_type=jnp.float32)
                return (d + (t + i).astype(jnp.float32) * 1e-6 *
                        c.astype(jnp.float32)).astype(jnp.bfloat16)
            return jnp.sum(jax.lax.fori_loop(0, iters, body, c).astype(
                jnp.float32))

        float(chain(a, b, c0, jnp.asarray(0.0)))  # compile + settle
        flops = 2.0 * m * k * n * iters
        best = 0.0
        for t in range(trials):
            t0 = time.time()
            float(chain(a, b, c0, jnp.asarray(float(100 + t))))
            dt = time.time() - t0
            tf = flops / dt / 1e12
            if tf > 200.0:  # > nameplate: memoized replay, reject
                print(f"  {tag} trial {t}: REJECT {tf:.1f} TF/s", flush=True)
                continue
            best = max(best, tf)
            print(f"  {tag} trial {t}: {tf:.1f} TFLOP/s "
                  f"({100 * tf / 197:.1f}% of bf16 peak)", flush=True)
        return best

    shapes = [
        # flash fwd/bwd logits tile: (BQ, D) x (D, BK)
        ("flash logits tile (1024,64)x(64,1024)", 1024, 64, 1024),
        # flash pv / dq tiles: (BQ, BK) x (BK, D)
        ("flash pv tile (1024,1024)x(1024,64)", 1024, 1024, 64),
        # a full-sequence quadratic equivalent at 5000p per (b,h)
        ("quadratic logits (5120,64)x(64,5120)", 5120, 64, 5120),
        # dense-encoder control (round-2 measured ~78.5 TF/s)
        ("encoder dense (32768,768)x(768,768)", 32768, 768, 768),
        # MXU-friendly reference point
        ("square control (4096,4096)x(4096,4096)", 4096, 4096, 4096),
    ]
    out = {}
    for tag, m, k, n in shapes:
        print(tag, flush=True)
        out[tag] = time_matmul(m, k, n, tag=tag)
    print("best TFLOP/s by shape:", flush=True)
    for tag, tf in out.items():
        print(f"  {tag}: {tf:.1f} ({100 * tf / 197:.1f}%)", flush=True)
    print("PROBE ATTN ROOFLINE DONE", flush=True)


if __name__ == "__main__":
    main()
