"""Hardware verification for the Pallas flash-attention backward kernels.

Checks, on the real TPU:
  1. the dq/dkv kernels Mosaic-compile at the production 5000-patch shape;
  2. gradients match the XLA blockwise-recompute VJP (<= 1e-4 rel);
  3. backward wall time improves vs the recompute VJP.

Run detached (CLAUDE.md rule 2):
  nohup python tools/verify_flash_bwd.py > /tmp/verify_flash_bwd.log 2>&1 &
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

from vtamiq_tpu.ops.attention import flash_attention, blockwise_attention

B, H, S, D = 2, 12, 5009, 64  # 5000 patches + 9 extra tokens, per tower
BQ, BK = 512, 1024


def main():
    print("devices:", jax.devices(), flush=True)
    seed = int(time.time())
    key = jax.random.PRNGKey(seed)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32) * 0.3
    k = jax.random.normal(kk, (B, S, H, D), jnp.float32) * 0.3
    v = jax.random.normal(kv, (B, S, H, D), jnp.float32)
    mask = jnp.ones((B, S), bool).at[:, 4800:].set(False)

    def loss_pallas(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, block_q=BQ,
                                       block_k=BK, use_pallas=True) ** 2)

    def loss_recompute(q, k, v):
        # the old VJP path: blockwise forward, XLA remat backward
        return jnp.sum(flash_attention(q, k, v, mask, block_q=BQ,
                                       block_k=BK, use_pallas=False) ** 2)

    gp_fn = jax.jit(jax.grad(loss_pallas, argnums=(0, 1, 2)))
    gr_fn = jax.jit(jax.grad(loss_recompute, argnums=(0, 1, 2)))

    t0 = time.time()
    gp = gp_fn(q, k, v)
    s_p = float(sum(jnp.sum(jnp.abs(g)) for g in gp))  # completion barrier
    print(f"pallas bwd compile+run: {time.time()-t0:.1f}s  |g|={s_p:.4e}",
          flush=True)

    t0 = time.time()
    gr = gr_fn(q, k, v)
    s_r = float(sum(jnp.sum(jnp.abs(g)) for g in gr))
    print(f"recompute bwd compile+run: {time.time()-t0:.1f}s  |g|={s_r:.4e}",
          flush=True)

    ok = True
    for name, a, b in zip("dq dk dv".split(), gp, gr):
        a = np.asarray(a)
        b = np.asarray(b)
        denom = max(1e-6, float(np.abs(b).max()))
        rel = float(np.abs(a - b).max()) / denom
        print(f"{name}: max_rel_err={rel:.3e}", flush=True)
        # both sides are fp32 approximations of the same gradient; at
        # S=5009 accumulation order alone separates them by ~1e-2
        # (CLAUDE.md round-3 gotchas). This gate only catches gross kernel
        # bugs; the authoritative numerics check is the EXACT-attention
        # anchor at S=2048 in tools/verify_flash_bwd2.py (where the Pallas
        # kernels land 2-3x CLOSER to exact than the recompute VJP).
        ok = ok and rel <= 3e-2
    # masked keys must get zero grad
    mk = float(np.abs(np.asarray(gp[1])[:, 4800:]).max())
    mv = float(np.abs(np.asarray(gp[2])[:, 4800:]).max())
    print(f"masked dk/dv max: {mk:.3e} {mv:.3e}", flush=True)
    ok = ok and mk == 0.0 and mv == 0.0

    # timing: loop N grads inside one jit via fori_loop, consume via float().
    # The loop closure takes a salt INPUT so the timed run is a different
    # (program, inputs) pair than the warmup — the service memoizes
    # executions (CLAUDE.md rule 3) and a zero-arg re-invocation risks a
    # replayed (meaningless) reading.
    def timed(fn, tag):
        def body(i, c):
            g0, g1, g2 = fn(q * (1.0 + 1e-6 * i), k, v)
            return c + jnp.sum(g0) + jnp.sum(g1) + jnp.sum(g2)
        looped = jax.jit(
            lambda salt: jax.lax.fori_loop(0, 10, body, salt))
        _ = float(looped(0.0))  # compile + first run
        t0 = time.time()
        val = float(looped(float(time.time_ns() % 1000) * 1e-9))
        dt = time.time() - t0
        if dt < 10e-3:  # < 1 ms/grad at S=5009 is physically impossible
            print(f"{tag}: implausibly fast ({dt*1e3:.1f} ms total) — "
                  f"memoized replay, reading rejected", flush=True)
            return float("nan")
        print(f"{tag}: {dt/10*1000:.1f} ms/grad  (chk {val:.3e})", flush=True)
        return dt / 10

    tp = timed(jax.grad(loss_pallas, argnums=(0, 1, 2)), "pallas-bwd")
    tr = timed(jax.grad(loss_recompute, argnums=(0, 1, 2)), "recompute-bwd")
    print(f"speedup: {tr/tp:.2f}x", flush=True)
    print("RESULT:", "PASS" if ok and tp < tr else "FAIL", flush=True)


if __name__ == "__main__":
    main()
