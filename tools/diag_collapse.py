"""Root-cause the config-4 paired-sweep training collapses (VERDICT r4 #1).

Round-4 evidence: on identical init+splits, torch finishes >=0.47 SROCC in
5/5 runs while our stack collapses to 0.11 (run 2) and 0.01 (run 4). This
tool reruns ONE sweep leg (parity_run._multiscale_torch_sweep protocol,
exactly — same seed derivation, same splits, same init) with per-step
instrumentation and ours-side ablation variants, writing a JSONL trace:

  per step : loss components, grad norm, prediction spread (q mean/std/
             min/max), learning rate
  per epoch: held-out SROCC (eval step built once, reused — no recompiles)

Ours-side variants (--variant):
  baseline  bf16 compute, bf16 head (the collapsing round-4 configuration)
  headfp32  bf16 backbone, fp32 tower-diff + DiffNet + q head
            (hypothesis: the bf16 cls_ref - cls_dist cancellation injects
            label-uncorrelated noise into rank/pears gradients)
  fp32      fp32 everything (upper bound / control)

Arms: --arm ours (TPU by default; fast) | torch (CPU reference loop, the
sweep's torch side verbatim, ~650 s).

Run detached (CLAUDE.md env rule 2):
  nohup python tools/diag_collapse.py --run 2 --variant baseline \
      > /tmp/diag_r2_base.log 2>&1 &
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=int, default=2, help="sweep run index (0-4)")
    ap.add_argument("--seed", type=int, default=0, help="args.seed of the sweep")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--arm", choices=["ours", "torch"], default="ours")
    ap.add_argument("--variant", choices=["baseline", "headfp32", "fp32",
                                          "mixed"],
                    default="baseline", help="ours-arm ablation")
    ap.add_argument("--skip-small", type=int, default=0,
                    help="ours arm: skip train batches with valid < N "
                    "(tests the tiny-remainder-batch hypothesis: the "
                    "exact-size loader emits ~7 valid<8 batches/epoch on "
                    "7-size synthetic LIVE where torch's mixed-size "
                    "batching emits none; rank/pears on 2-4 points are "
                    "noise-dominated)")
    ap.add_argument("--buckets", type=int, default=0,
                    help="ours arm: train with canonical-bucket padding "
                    "(PatchDatasetLoader max_size_buckets=N). Tests the "
                    "BATCH-COMPOSITION hypothesis: exact-size batching on "
                    "7-size synthetic LIVE confines every batch to one "
                    "size (few refs, 7 tiny remainders/epoch, down to "
                    "valid=1) where torch's loader mixes all refs freely; "
                    "rank/pears are batch-relative, so composition shapes "
                    "their gradients. buckets=1 pads everything to one "
                    "shape -> fully mixed batches, 1 remainder, img_hw "
                    "masking keeps sampling exact (round-5, seed-8 fp32 "
                    "collapse)")
    ap.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                    help="default: tpu for ours, cpu for torch")
    ap.add_argument("--trace", default=None, help="JSONL trace path "
                    "(default /tmp/diag_collapse_<arm>_r<run>_<variant>.jsonl)")
    ap.add_argument("--eval-every", type=int, default=1,
                    help="held-out eval every N epochs (0 = final only)")
    ap.add_argument("--max-steps", type=int, default=0,
                    help="stop after N train steps (smoke tests; 0 = all)")
    a = ap.parse_args()

    platform = a.platform or ("cpu" if a.arm == "torch" else "tpu")
    import jax
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    import parity_run as PR

    vtag = a.variant if a.arm == "ours" else "ref"
    if a.skip_small and a.arm == "ours":
        vtag += f"_skip{a.skip_small}"
    if a.buckets and a.arm == "ours":
        vtag += f"_bkt{a.buckets}"
    trace_path = a.trace or f"/tmp/diag_collapse_{a.arm}_r{a.run}_{vtag}.jsonl"
    tf = open(trace_path, "w", buffering=1)

    def emit(rec):
        tf.write(json.dumps(rec) + "\n")

    class A:
        seed = a.seed
        full = True
        repeats = 2
    args = A()

    from vtamiq_tpu.data.datasets import dataset_split
    from vtamiq_tpu.data.pipeline import PatchDatasetLoader
    from vtamiq_tpu.ops.sampling import PatchSampler
    from vtamiq_tpu.ops.correlations import compute_correlations_flat
    from vtamiq_tpu.train import engine
    from vtamiq_tpu.train.optim import make_optimizer, build_freeze_mask
    from vtamiq_tpu.train.steps import ExtractConfig, make_train_step, make_eval_step

    run = a.run
    epochs = a.epochs
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
    seed = a.seed + 7 * run + 1
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n_refs)
    train_refs = sorted(int(r) for r in perm[:17])
    test_refs = sorted(int(r) for r in perm[17:23])
    ds = PR.our_dataset("live")
    train_idx = PR.pair_indices_for_refs(ds, train_refs, args)
    test_idx = PR.pair_indices_for_refs(ds, test_refs, args, cap=64)
    params0 = jax.tree_util.tree_map(
        np.asarray, engine.get_model_params(cfg, None, seed=seed))
    p0_sum = float(sum(np.abs(l).sum() for l in jax.tree_util.tree_leaves(params0)))
    hdr = {"kind": "header", "arm": a.arm, "run": run, "seed": seed,
           "variant": a.variant if a.arm == "ours" else "ref-fp32",
           "platform": platform, "train_pairs": len(train_idx),
           "test_pairs": len(test_idx), "params0_abssum": round(p0_sum, 3)}
    print(hdr, flush=True)
    emit(hdr)

    if a.arm == "ours":
        compute_dtype = {"fp32": jnp.float32, "mixed": "mixed"}.get(
            a.variant, jnp.bfloat16)
        # (the 'headfp32' variant was adjudicated a no-op: vit_forward
        # already returns fp32 tokens, so the head always ran fp32;
        # 'mixed' = fp32 residual stream + bf16 MXU matmuls — the candidate
        # production fix if it matches fp32's stability)

        ds.splits_dict["SweepTrain"] = dataset_split(
            "SweepTrain", np.asarray(train_idx))
        loader = PatchDatasetLoader(ds, "SweepTrain", batch_size=batch,
                                    patch_count=train_pc, shuffle=True,
                                    seed=seed, max_size_buckets=a.buckets)
        mean, std = ds.get_norm_mean_std()
        optimizer, schedule = make_optimizer(g, max(1, len(loader)) * epochs)
        sampler = PatchSampler(**C.dataset_config_base["patch_sampler_config"])
        ecfg = ExtractConfig(patch_count=train_pc, patch_dim=16,
                             patch_num_scales=3, scale_num_samples_ratio=2.0,
                             norm_mean=tuple(mean), norm_std=tuple(std))
        step = make_train_step(cfg, sampler, ecfg, optimizer,
                               compute_dtype=compute_dtype)
        eval_step = make_eval_step(cfg, sampler, dataclass_replace(
            ecfg, patch_count=eval_pc), compute_dtype=compute_dtype)

        ds_eval = PR.our_dataset("live")
        ds_eval.splits_dict["DiagTest"] = dataset_split(
            "DiagTest", np.asarray(test_idx))
        eval_loader = PatchDatasetLoader(ds_eval, "DiagTest", batch_size=8,
                                         patch_count=eval_pc, shuffle=False,
                                         seed=a.seed)

        def run_eval(params):
            key = jax.random.PRNGKey(a.seed + 7)
            lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)
            ys, yps = [], []
            for repeat in range(2):
                for b in eval_loader:
                    key, sub = jax.random.split(key)
                    _, q_p = eval_step(params, jnp.asarray(b.imgs_raw),
                                       jnp.asarray(b.qs), jnp.asarray(b.valid),
                                       sub, lw)
                    v = b.valid
                    ys.append(np.asarray(b.qs[:v], float))
                    yps.append(np.asarray(q_p, float)[:v])
            return compute_correlations_flat(ys, yps, 2, warn=None)

        params = jax.tree_util.tree_map(jnp.asarray, params0)
        opt_state = optimizer.init(params)
        mask = build_freeze_mask(params, False, None)
        key = jax.random.PRNGKey(seed + 13)
        lw = jnp.asarray((1.0, 1.0, 1.0), jnp.float32)
        step_i = 0
        for ep in range(epochs):
            for b in loader:
                if a.skip_small and b.valid < a.skip_small:
                    continue
                key, sub = jax.random.split(key)
                hw = jnp.asarray(b.img_hw) if a.buckets else None
                params, opt_state, m, q = step(
                    params, opt_state, mask, jnp.asarray(b.imgs_raw),
                    jnp.asarray(b.qs), jnp.asarray(b.valid), sub, lw,
                    img_hw=hw)
                qn = np.asarray(q, float)[: b.valid]
                rec = {"kind": "step", "ep": ep, "step": step_i,
                       "loss": float(m["loss"]), "mae": float(m["mae"]),
                       "rank": float(m["rank"]), "pears": float(m["pears"]),
                       "gnorm": float(m["grad_norm"]),
                       "lr": float(schedule(step_i)),
                       "q_mean": float(qn.mean()), "q_std": float(qn.std()),
                       "q_min": float(qn.min()), "q_max": float(qn.max()),
                       "y_std": float(np.asarray(b.qs, float)[: b.valid].std()),
                       "valid": int(b.valid)}
                emit(rec)
                if step_i % 10 == 0:
                    print(f"ep{ep} s{step_i}: loss={rec['loss']:.4f} "
                          f"rank={rec['rank']:.4f} pears={rec['pears']:.4f} "
                          f"gn={rec['gnorm']:.3f} qstd={rec['q_std']:.5f}",
                          flush=True)
                step_i += 1
                if a.max_steps and step_i >= a.max_steps:
                    print(f"max-steps {a.max_steps} reached", flush=True)
                    emit({"kind": "final", "truncated_at_step": step_i})
                    return 0
            if a.eval_every and (ep + 1) % a.eval_every == 0:
                corr = run_eval(params)
                rec = {"kind": "eval", "ep": ep,
                       **{k: round(float(v), 5) for k, v in corr.items()}}
                emit(rec)
                print(rec, flush=True)
        final = run_eval(params)
        rec = {"kind": "final", **{k: round(float(v), 5)
                                   for k, v in final.items()}}
        emit(rec)
        print(rec, flush=True)
        return 0

    # ---- torch arm: the sweep's reference loop, instrumented ----
    if not PR.install_reference():
        print("reference unavailable", flush=True)
        return 1
    PR.point_frameworks_at(os.path.join(PR.REPO, ".parity_data"))
    import torch
    from torch_bridge import build_reference_model, jax_to_torch
    import train as ref_train

    model = build_reference_model(cfg)
    jax_to_torch(params0, model, cfg)
    model.train()
    torch.manual_seed(seed)
    opt = torch.optim.AdamW(model.parameters(),
                            lr=g["optimizer_learning_rate"],
                            weight_decay=g["optimizer_weight_decay"])
    ds_ref = PR._build_ref_eval_dataset("live", train_idx, train_pc, 3)
    ds_val = PR._build_ref_eval_dataset("live", test_idx, eval_pc, 3)
    t_rng = np.random.default_rng(seed + 1)
    step_i = 0
    for ep in range(epochs):
        order = t_rng.permutation(len(train_idx))
        for start in range(0, len(order), batch):
            items = [ds_ref[int(i)] for i in order[start:start + batch]]
            if len(items) < 2:
                continue
            y = torch.stack([torch.as_tensor(float(it[0])) for it in items])
            tp = torch.stack([it[1] for it in items])
            tu = torch.stack([it[2] for it in items])
            ts = torch.stack([it[3] for it in items])
            q_p, _ = model((tp[:, 0].contiguous(), tp[:, 1].contiguous()),
                           (tu[:, 0].contiguous(), tu[:, 1].contiguous()),
                           (ts[:, 0].contiguous(), ts[:, 1].contiguous()))
            loss, mae, rank, pears = ref_train.loss_func_iqa(
                q_p.reshape(-1), y, len(items), "cpu", 1.0, 1.0, 1.0)
            opt.zero_grad()
            loss.backward()
            gn = float(torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0))
            opt.step()
            qn = q_p.detach().reshape(-1).numpy()
            rec = {"kind": "step", "ep": ep, "step": step_i,
                   "loss": float(loss), "mae": float(mae),
                   "rank": float(rank), "pears": float(pears),
                   "gnorm": gn, "lr": float(g["optimizer_learning_rate"]),
                   "q_mean": float(qn.mean()), "q_std": float(qn.std()),
                   "q_min": float(qn.min()), "q_max": float(qn.max()),
                   "y_std": float(y.numpy().std()), "valid": len(items)}
            emit(rec)
            if step_i % 10 == 0:
                print(f"ep{ep} s{step_i}: loss={rec['loss']:.4f} "
                      f"rank={rec['rank']:.4f} pears={rec['pears']:.4f} "
                      f"gn={gn:.3f} qstd={rec['q_std']:.5f}", flush=True)
            step_i += 1
        if a.eval_every and (ep + 1) % a.eval_every == 0:
            val = PR._torch_eval_model(model, ds_val, test_idx, args, repeats=2)
            model.train()
            rec = {"kind": "eval", "ep": ep,
                   **{k: round(float(v), 5) for k, v in val.items()}}
            emit(rec)
            print(rec, flush=True)
    final = PR._torch_eval_model(model, ds_val, test_idx, args, repeats=2)
    rec = {"kind": "final", **{k: round(float(v), 5) for k, v in final.items()}}
    emit(rec)
    print(rec, flush=True)
    return 0


def dataclass_replace(ecfg, **kw):
    import dataclasses
    return dataclasses.replace(ecfg, **kw)


if __name__ == "__main__":
    sys.exit(main())
