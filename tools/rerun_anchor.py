"""Re-measure a parity config's identical-weights torch anchor at a
noise-resolving budget (256 pairs x 4 repeats) and patch PARITY_REPORT.json.

The full-mode anchors for configs 3-5 default to 128 pairs x 2 repeats
(parity_run.anchor_eval): the two stacks draw independent patch samples, so
the correlation-delta noise at that budget is COMPARABLE to the 0.005 gate —
config 3 once read an identical-weights dPLCC of 0.00529 (noise, but a
fail). This reruns ONLY the anchor_eval leg on the SAME trained checkpoint
(preserved from the full run's workdir) with 2x pairs and 2x repeats,
records both readings, and recomputes the config's pass.

  config 3: KADID val-split anchor    (parity_run.run_config3)
  config 4: TID 3-scale multiscale anchor (parity_run._multiscale_eval_anchor)
  config 5: TID test-split anchor on the PIPAL-trained ckpt (run_config5)

Run detached (CLAUDE.md rule 2):
  nohup python tools/rerun_anchor.py --config 3 --ckpt /tmp/parity_cfg3_ckpt/best.npz &
"""
import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REPORT = os.path.join(REPO, "PARITY_REPORT.json")

# per-config anchor recipe: dataset, split source, scales, gate multiple,
# and where the anchor record lives inside the config's report entry
RECIPES = {
    3: dict(dataset="kadid10k", split="val", num_scales=1, gate_mult=1,
            key="identical_weights_val_eval"),
    4: dict(dataset="tid2013", split="test", num_scales=3, gate_mult=2,
            key="identical_weights_multiscale_eval"),
    5: dict(dataset="tid2013", split="test", num_scales=1, gate_mult=1,
            key="identical_weights_cross_db_eval", fit_free=True),
}


def recompute_pass(cfg_no, entry, anchor_ok):
    """Mirror each run_config*'s own pass logic with the new anchor."""
    if cfg_no == 3:
        srocc = entry.get("val_SROCC_after_1_epoch", float("nan"))
        ok = bool(srocc == srocc and srocc > 0.3) and anchor_ok
        if "training_dynamics" in entry:
            ok = ok and entry["training_dynamics"]["pass"]
        return ok
    if cfg_no == 4:
        mean = entry.get("stats", {}).get("SROCC", {}).get("mean")
        return bool(mean is not None and mean == mean) and anchor_ok
    if cfg_no == 5:
        cross = entry.get("cross_database", {})
        finite = all(v is not None and v["SROCC"] == v["SROCC"]
                     for v in cross.values())
        ok = bool(cross) and finite and anchor_ok
        by_epoch = entry.get("train_SROCC_by_epoch")
        if by_epoch:
            ok = ok and by_epoch[-1] > 0.3
        return ok
    raise ValueError(cfg_no)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=int, required=True, choices=(3, 4, 5))
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--pairs", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=4)
    opts = ap.parse_args()
    recipe = RECIPES[opts.config]

    import parity_run as pr

    args = pr.parse_args(["--full",
                          "--torch-pairs-full", str(opts.pairs),
                          "--anchor-repeats", str(opts.repeats)])
    root = args.root
    assert pr.install_reference(), "torch reference unavailable"
    pr.ensure_datasets(root, [recipe["dataset"]], full=True)
    pr.point_frameworks_at(root)

    C = pr.fresh_configs()
    pr.point_frameworks_at(root)
    from vtamiq_tpu.train import engine
    if recipe["num_scales"] > 1:
        C.dataset_config_base["patch_num_scales"] = recipe["num_scales"]
        C.dataset_config_base["patch_sampling_num_scales_ratio"] = 2.0
        C.vit_config["num_scales"] = recipe["num_scales"]
    cfg = pr.build_cfg(C)
    params = engine.get_model_params(cfg, opts.ckpt,
                                     force_load_pretrained=True,
                                     seed=args.seed)
    split_cfg = getattr(C, f"split_config_{recipe['dataset']}")
    split = C.SPLIT_NAME_VAL if recipe["split"] == "val" else C.SPLIT_NAME_TEST
    refs = list(split_cfg[split])
    ds = pr.our_dataset(recipe["dataset"])
    idx = pr.pair_indices_for_refs(ds, refs, args, cap=pr.anchor_pair_cap(args))
    print(f"anchor rerun config {opts.config}: {len(idx)} pairs x "
          f"{opts.repeats} repeats, ckpt={opts.ckpt}", flush=True)
    anchor = pr.anchor_eval(params, cfg, C, recipe["dataset"], idx, args,
                            num_scales=recipe["num_scales"],
                            gate=recipe["gate_mult"] * args.gate,
                            fit_free=recipe.get("fit_free", False))
    print(json.dumps(anchor, indent=1, default=float), flush=True)

    with open(REPORT) as f:
        report = json.load(f)
    entry = report["configs"][str(opts.config)]
    key = recipe["key"]
    prior = entry.pop(key, None)
    if prior is not None:
        entry[key + "_initial"] = prior
    rerun_note = (f"re-measured at {len(idx)} pairs x {opts.repeats} "
                  "repeats: the initial low-budget reading (kept above) "
                  "carries patch-sampling delta noise comparable to the gate")
    if anchor.get("note"):
        rerun_note = anchor["note"] + "; " + rerun_note
    entry[key] = dict(anchor, note=rerun_note)
    entry["pass"] = recompute_pass(opts.config, entry, anchor["pass"])
    gates = [c.get("pass") for c in report["configs"].values() if "pass" in c]
    report["all_pass"] = bool(gates) and all(gates)
    report["generated_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(REPORT, "w") as f:
        json.dump(report, f, indent=2, default=float)
    print(f"config{opts.config} pass:", entry["pass"],
          "all_pass:", report["all_pass"], flush=True)


if __name__ == "__main__":
    main()
