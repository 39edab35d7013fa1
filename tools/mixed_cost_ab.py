"""Measure the throughput cost of compute_dtype="mixed" vs "bfloat16" on
the production 500-patch fused train step (B16, batch 16).

The "mixed" policy (fp32 residual stream, bf16 MXU matmuls) is prescribed
for from-scratch small-batch training (docs/PARITY.md round-5 additions);
this tool puts a number on what it costs at the PRODUCTION shape so the
config.py guidance ("bfloat16 is fastest") is a measured claim.

Relay A/B protocol per CLAUDE.md round-4 gotchas: settled inputs, arm
order rotated per trial, and an A/A control (bf16 twice) bounding the
noise floor. Steps inside one timed call evolve donated params, so every
dispatch's inputs differ (relay memo defeated).

Usage:  nohup python tools/mixed_cost_ab.py > /tmp/mixed_cost_ab.log 2>&1 &
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
    from vtamiq_tpu.models.vtamiq import init_vtamiq_params
    from vtamiq_tpu.ops.sampling import PatchSampler
    from vtamiq_tpu.train.steps import ExtractConfig, make_train_step
    from vtamiq_tpu.train.optim import build_freeze_mask
    from vtamiq_tpu.utils.benchharness import fresh_pair_batch

    batch, patches, n_steps, trials = 16, 500, 10, 6
    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6,
                                          num_extra_tokens=8))
    ecfg = ExtractConfig(patch_count=patches, patch_dim=16,
                         norm_mean=(0.5, 0.5, 0.5))
    sampler = PatchSampler()
    optimizer = optax.adamw(5e-5, weight_decay=0.01)
    print(f"device: {jax.devices()[0].device_kind}  "
          f"b{batch} p{patches} steps/call {n_steps}", flush=True)

    def make_arm(compute_dtype):
        params = init_vtamiq_params(jax.random.PRNGKey(1), cfg)
        state = {"params": params, "opt": optimizer.init(params)}
        mask = build_freeze_mask(params, False, None)
        step = make_train_step(cfg, sampler, ecfg, optimizer,
                               compute_dtype=compute_dtype)
        raw, key = fresh_pair_batch(batch, 384, 512)
        rng = np.random.default_rng(int(time.time_ns()) & 0x7FFFFFFF)
        qs = jnp.asarray(rng.uniform(0, 1, (batch,)), jnp.float32)
        lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)

        def run(k, n):
            m = None
            for i in range(n):
                state["params"], state["opt"], m, _ = step(
                    state["params"], state["opt"], mask, raw, qs,
                    jnp.asarray(batch), jax.random.fold_in(k, i), lw)
            return float(m["loss"])

        run(jax.random.fold_in(key, 7), 1)  # compile + settle
        return run, key

    arms = {}
    for name, cd in (("bf16", jnp.bfloat16), ("bf16_aa", jnp.bfloat16),
                     ("mixed", "mixed")):
        arms[name] = make_arm(cd)
        print(f"compiled arm {name}", flush=True)

    results = {name: [] for name in arms}
    order = list(arms)
    for t in range(trials):
        rot = order[t % len(order):] + order[:t % len(order)]
        for name in rot:
            run, key = arms[name]
            t0 = time.time()
            run(jax.random.fold_in(key, 1000 + t), n_steps)
            dt = time.time() - t0
            rate = batch * n_steps / dt
            if rate > 3000.0:  # physically implausible: memoized replay
                print(f"trial {t} {name}: REJECT {rate:.1f} pairs/s",
                      flush=True)
                continue
            results[name].append(rate)
            print(f"trial {t} {name}: {rate:.1f} pairs/s", flush=True)

    med = {n: float(np.median(v)) for n, v in results.items() if v}
    print("medians:", {n: round(v, 1) for n, v in med.items()}, flush=True)
    if {"bf16", "mixed", "bf16_aa"} <= med.keys():
        aa = abs(med["bf16"] - med["bf16_aa"]) / med["bf16"]
        cost = (med["bf16"] - med["mixed"]) / med["bf16"]
        print(f"A/A noise floor: {100 * aa:.1f}%  "
              f"mixed cost vs bf16: {100 * cost:.1f}%", flush=True)
    print("MIXED COST AB DONE", flush=True)


if __name__ == "__main__":
    main()
