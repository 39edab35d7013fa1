"""Round 10: flash-attention block-size sweep at the 5000-patch config
(S = 5120 tokens after padding). The shipped blocks (bq=256, bk=512) were
chosen at shorter sequences; at S=5120 the attention is ~70% of FLOPs and
runs ~24% MFU — bigger blocks amortize the online-softmax bookkeeping.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/profile_experiments10.py > /tmp/exp10.log 2>&1 &
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp

from vtamiq_tpu.ops.attention import flash_attention

B, H, S, D, ITERS = 16, 12, 5120, 64, 8  # 8 pairs x 2 towers
seed = int(time.time()) & 0x7FFFFFFF
rng = np.random.default_rng(seed)
key = jax.random.PRNGKey(seed)
print("device:", jax.devices()[0], "seed:", seed, flush=True)

q = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.bfloat16)
mask = jnp.arange(S)[None, :] < (S - 111)  # realistic pad tail
mask = jnp.broadcast_to(mask, (B, S))

FLOPS = 2 * 2 * B * H * S * S * D * ITERS


def bench(bq, bk):
    def loop(q, k, v, key):
        def body(i, acc):
            qi = q + jax.random.normal(jax.random.fold_in(key, i),
                                       (1, 1, 1, 1), jnp.bfloat16) * 1e-6
            out = flash_attention(qi, k, v, mask, block_q=bq, block_k=bk)
            return acc + jnp.sum(out.astype(jnp.float32))
        return jax.lax.fori_loop(0, ITERS, body, jnp.zeros((), jnp.float32))

    f = jax.jit(loop)
    try:
        float(f(q, k, v, jax.random.fold_in(key, bq * 10000 + bk)))
        best = None
        for t in range(3):
            t0 = time.perf_counter()
            out = float(f(q, k, v, jax.random.fold_in(key, bq * 100 + bk + t)))
            dt = time.perf_counter() - t0
            tf = FLOPS / dt / 1e12
            if tf < 300:
                best = max(best or 0.0, tf)
        print(f"bq={bq:5d} bk={bk:5d}  "
              f"{best if best else float('nan'):6.1f} TFLOP/s (out={out:.1f})",
              flush=True)
    except Exception as e:
        print(f"bq={bq:5d} bk={bk:5d}  FAILED: {type(e).__name__}: {e}",
              flush=True)


def main():
    for bq, bk in ((256, 512), (512, 512), (512, 1024), (1024, 1024),
                   (512, 2560), (1024, 2560), (2560, 2560), (1024, 5120)):
        bench(bq, bk)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
