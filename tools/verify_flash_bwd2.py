"""Anchor the two flash-VJP implementations against EXACT attention autodiff
at S=2048 (where the (S, S) tensor fits), on the real TPU: whichever path
deviates more from exact carries the real error.

  nohup python tools/verify_flash_bwd2.py > /tmp/verify_flash_bwd2.log 2>&1 &
"""
import math
import time
import numpy as np
import jax
import jax.numpy as jnp

from vtamiq_tpu.ops.attention import flash_attention

B, H, S, D = 2, 12, 2048, 64
BQ, BK = 512, 1024


def exact(q, k, v, mask):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(D)
    logits = jnp.where(mask[:, None, None, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v,
                      preferred_element_type=jnp.float32)


def main():
    print("devices:", jax.devices(), flush=True)
    seed = int(time.time())
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(kq, (B, S, H, D), jnp.float32) * 0.3
    k = jax.random.normal(kk, (B, S, H, D), jnp.float32) * 0.3
    v = jax.random.normal(kv, (B, S, H, D), jnp.float32)
    mask = jnp.ones((B, S), bool).at[:, 1900:].set(False)

    def loss(f):
        return lambda q, k, v: jnp.sum(f(q, k, v) ** 2)

    fns = {
        "exact": loss(lambda q, k, v: exact(q, k, v, mask)),
        "pallas_fused": loss(lambda q, k, v: flash_attention(
            q, k, v, mask, block_q=BQ, block_k=BK, use_pallas=True,
            fused_bwd=True)),
        "pallas_split": loss(lambda q, k, v: flash_attention(
            q, k, v, mask, block_q=BQ, block_k=BK, use_pallas=True,
            fused_bwd=False)),
        "recompute": loss(lambda q, k, v: flash_attention(
            q, k, v, mask, block_q=BQ, block_k=BK, use_pallas=False)),
    }
    grads = {}
    for name, f in fns.items():
        t0 = time.time()
        g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(q, k, v)
        s = float(sum(jnp.sum(jnp.abs(x)) for x in g))
        grads[name] = [np.asarray(x) for x in g]
        print(f"{name}: {time.time()-t0:.1f}s |g|={s:.6e}", flush=True)

    for name in ("pallas_fused", "pallas_split", "recompute"):
        for comp, a, b in zip("dq dk dv".split(), grads[name], grads["exact"]):
            denom = max(1e-6, float(np.abs(b).max()))
            rel = float(np.abs(a - b).max()) / denom
            print(f"{name} vs exact {comp}: max_rel={rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
