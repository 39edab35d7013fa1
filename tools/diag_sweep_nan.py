"""Diagnose the config-4 torch_sweep run-1 (seed 8) NaN in the ours arm.

Reproduces parity_run._multiscale_torch_sweep's ours-arm training loop on
CPU with per-step instrumentation (loss components, grad norm, prediction
spread, param finiteness) and stops at the first non-finite signal.

Run: python tools/diag_sweep_nan.py [--run 1] [--steps-only]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

import parity_run as PR


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=int, default=1)
    ap.add_argument("--seed", type=int, default=0, help="args.seed of the sweep")
    ap.add_argument("--epochs", type=int, default=3)
    args_ns = ap.parse_args()

    class A:  # minimal stand-in for parity_run args
        seed = args_ns.seed
        full = True
        repeats = 2
    args = A()

    from vtamiq_tpu.data.datasets import dataset_split
    from vtamiq_tpu.data.pipeline import PatchDatasetLoader
    from vtamiq_tpu.ops.sampling import PatchSampler
    from vtamiq_tpu.train import engine
    from vtamiq_tpu.train.optim import make_optimizer, build_freeze_mask
    from vtamiq_tpu.train.steps import ExtractConfig, make_train_step

    run = args_ns.run
    n_runs, epochs = 5, args_ns.epochs
    train_pc, eval_pc, batch = 128, 256, 8
    C = PR.fresh_configs()
    PR.point_frameworks_at(os.path.join(PR.REPO, ".parity_data"))
    C.dataset_config_base["patch_num_scales"] = 3
    C.dataset_config_base["patch_sampling_num_scales_ratio"] = 2.0
    C.vit_config["num_scales"] = 3
    cfg = PR.build_cfg(C)
    g = C.global_config

    ds_probe = PR.our_dataset("live")
    n_refs = len(ds_probe.dist_images_per_image)

    seed = args.seed + 7 * run + 1
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_refs)
    train_refs = sorted(int(r) for r in perm[:17])
    test_refs = sorted(int(r) for r in perm[17:23])
    ds = PR.our_dataset("live")
    train_idx = PR.pair_indices_for_refs(ds, train_refs, args)
    test_idx = PR.pair_indices_for_refs(ds, test_refs, args, cap=64)
    print(f"run={run} seed={seed} train_pairs={len(train_idx)} "
          f"test_pairs={len(test_idx)}", flush=True)

    params0 = jax.tree_util.tree_map(
        np.asarray, engine.get_model_params(cfg, None, seed=seed))

    ds.splits_dict["SweepTrain"] = dataset_split(
        "SweepTrain", np.asarray(train_idx))
    loader = PatchDatasetLoader(ds, "SweepTrain", batch_size=batch,
                                patch_count=train_pc, shuffle=True,
                                seed=seed)
    mean, std = ds.get_norm_mean_std()
    optimizer, schedule = make_optimizer(g, max(1, len(loader)) * epochs)
    step = make_train_step(
        cfg, PatchSampler(**C.dataset_config_base["patch_sampler_config"]),
        ExtractConfig(patch_count=train_pc, patch_dim=16,
                      patch_num_scales=3, scale_num_samples_ratio=2.0,
                      norm_mean=tuple(mean), norm_std=tuple(std)),
        optimizer)
    params = jax.tree_util.tree_map(jnp.asarray, params0)
    opt_state = optimizer.init(params)
    mask = build_freeze_mask(params, False, None)
    key = jax.random.PRNGKey(seed + 13)
    lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)

    def finite_params(p):
        leaves = jax.tree_util.tree_leaves(p)
        return all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)

    step_i = 0
    for ep in range(epochs):
        for b in loader:
            key, sub = jax.random.split(key)
            params, opt_state, m, q = step(
                params, opt_state, mask, jnp.asarray(b.imgs_raw),
                jnp.asarray(b.qs), jnp.asarray(b.valid), sub, lw)
            loss = float(m["loss"]); gn = float(m["grad_norm"])
            qn = np.asarray(q, float)[: b.valid]
            print(f"ep{ep} step{step_i}: loss={loss:.5f} "
                  f"(mae={float(m['mae']):.4f} rank={float(m['rank']):.4f} "
                  f"pears={float(m['pears']):.4f}) gnorm={gn:.3f} "
                  f"q std={qn.std():.5f} min={qn.min():.4f} max={qn.max():.4f} "
                  f"valid={b.valid}", flush=True)
            if not (np.isfinite(loss) and np.isfinite(gn) and
                    np.isfinite(qn).all()):
                print(f"NON-FINITE at ep{ep} step{step_i}; params finite: "
                      f"{finite_params(params)}", flush=True)
                np.save("/tmp/diag_bad_qs.npy", np.asarray(b.qs))
                return 1
            if not finite_params(params):
                print(f"PARAMS NON-FINITE after ep{ep} step{step_i} "
                      f"(loss/grad were finite)", flush=True)
                return 1
            step_i += 1

    ours_val = PR._our_eval_pairs(params, cfg, C, PR.our_dataset("live"),
                                  test_idx, args, patch_count=eval_pc,
                                  num_scales=3, repeats=2)
    print("eval:", {k: round(float(v), 5) for k, v in ours_val.items()},
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
