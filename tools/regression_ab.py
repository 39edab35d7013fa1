"""Settle the weighted-CAPS train 123.8 -> 115.2 pairs/s "regression"
(VERDICT r03 weak #3): measure the SAME step under BOTH historical
protocols in one session.

Round-2's 123.8 (commit d13f506, tools/measure_configs.py) was
``max`` over 8 separately-timed single dispatches; round-3's 115.2 was a
median. A max-vs-median gap of ~7% on an 8-trial sample is exactly what
per-dispatch relay jitter produces, so if (same code, same hour)
max-of-8 lands near 123 while the median lands near 115, the "regression"
is a reporting-statistic artifact, not a slowdown.

Protocol notes (CLAUDE.md rules 3/5): raw/qs are created ONCE and reused —
the relay's (program, inputs) execution memo is defeated because the
donated params/opt_state evolve every step, so no two dispatches share
inputs. Completion via float() of the loss, plausibility bound.

Run detached:  nohup python tools/regression_ab.py > /tmp/regression_ab.log 2>&1 &
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp


def main():
    import optax
    from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
    from vtamiq_tpu.models.vtamiq import init_vtamiq_params
    from vtamiq_tpu.ops.sampling import (PatchSampler, GRID_TYPE_PERTURBED,
                                         DIFF_TYPE_MAGNITUDE)
    from vtamiq_tpu.train.steps import ExtractConfig, make_train_step
    from vtamiq_tpu.train.optim import build_freeze_mask
    from vtamiq_tpu.utils.benchharness import fresh_pair_batch

    batch, patches = 8, 384  # the historical row's config (batch 8 x 384p)
    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6,
                                          num_extra_tokens=8))
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    optimizer = optax.adamw(5e-5, weight_decay=0.01)
    opt_state = optimizer.init(params)
    mask = build_freeze_mask(params, False, None)
    # the round-2 measurement's sampler verbatim (centerbias + diff + uniform)
    sampler = PatchSampler(centerbias_weight=1.0, diff_weight=1.0,
                           uniform_weight=0.1, grid_type=GRID_TYPE_PERTURBED,
                           diff_type=DIFF_TYPE_MAGNITUDE)
    step = make_train_step(cfg, sampler,
                           ExtractConfig(patch_count=patches, patch_dim=16),
                           optimizer)
    raw, key = fresh_pair_batch(batch, 384, 512)
    rng = np.random.default_rng(int(time.time()) & 0x7FFFFFFF)
    qs = jnp.asarray(rng.uniform(0, 1, (batch,)), jnp.float32)
    lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)

    p, o = params, opt_state
    p, o, m, _ = step(p, o, mask, raw, qs, jnp.asarray(batch),
                      jax.random.fold_in(key, 0), lw)
    print("compiled; loss", float(m["loss"]), flush=True)

    rates = []
    for t in range(1, 17):
        t0 = time.perf_counter()
        p, o, m, _ = step(p, o, mask, raw, qs, jnp.asarray(batch),
                          jax.random.fold_in(key, t), lw)
        float(m["loss"])  # device->host completion barrier (CLAUDE.md rule 5)
        rate = batch / (time.perf_counter() - t0)
        if rate < 2000:  # plausibility (v5e roofline)
            rates.append(rate)
        print(f"trial {t}: {rate:.1f} pairs/s", flush=True)

    out = {
        "generated_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "config": "weighted CAPS train step, batch 8 x 384p (historical row)",
        "trials": len(rates),
        "round2_protocol_max_of_first_8": round(max(rates[:8]), 1),
        "round3_protocol_median": round(float(np.median(rates)), 1),
        "min": round(min(rates), 1), "max": round(max(rates), 1),
        "all": [round(r, 1) for r in rates],
    }
    print(json.dumps(out), flush=True)
    with open(os.path.join(REPO, "docs", "regression_ab_r4.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
