"""Multi-seed KADIS-700k pretrain -> finetune workflow on hardware.

The reference's flagship weak-label recipe (run_custom.py:20-36 analog,
pretraining gates train_config.py:208-216) at statistical power (round-4):
``--seeds`` independent seeds, each running BOTH arms over IDENTICAL
per-seed TID2013 splits (paired design):

  pretrained: KADIS (``--refs`` x 5 = 5k weak-label pairs) 1-epoch
              pretrain -> small-train-split TID2013 finetune through the
              pretraining gates
  cold-start: the same finetune budget from random init

The finetune train split is deliberately SMALL (5 of 25 refs) so the
endpoint does not saturate (round-3 lesson: 2 epochs over the full 3000
synthetic pairs drove both arms to ~0.82 and the endpoint delta was
noise); the test split is large (12 refs) to cut eval noise. The headline
is the mean +- std of the per-seed PAIRED endpoint deltas — same splits,
same epochs, same eval — not an epoch-1 intermediate.

Run detached (CLAUDE.md rule 2):
  nohup python tools/run_kadis_workflow.py > /tmp/kadis_workflow.log 2>&1 &
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROOT = os.environ.get("VTAMIQ_DATASETS_PATH",
                      os.path.join(REPO, ".parity_data"))
os.environ["VTAMIQ_DATASETS_PATH"] = ROOT  # read live by resolve_datasets_root


def fresh_configs(seed):
    import importlib
    from vtamiq_tpu.train import config as C
    importlib.reload(C)
    from vtamiq_tpu.train import engine
    importlib.reload(engine)
    C.global_config["seed"] = seed
    C.global_config["is_verbose"] = False
    C.global_config["output_dir"] = os.path.join(REPO, ".kadis_workflow_out")
    C.global_config["num_repeats_test"] = 2
    return C


def val_trajectory(run_dir):
    """Per-epoch val-SROCC from the run's scalars.jsonl (convergence
    comparison alongside the endpoint headline)."""
    vals = []
    path = os.path.join(run_dir, "scalars.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                d = json.loads(line)
                if d["tag"].endswith("val-SROCC"):
                    vals.append((d["step"], round(d["value"], 6)))
    return vals


def install_kadis(C, refs):
    """Scaled-down KADIS subclass matching the generated corpus."""
    from vtamiq_tpu.data.datasets import KADIS700kDataset

    class SynthKADIS(KADIS700kDataset):
        num_ref_images = refs
        num_dist_images = 5
    C._DATASET_REGISTRY[C.DATASET_KADIS700K] = (
        SynthKADIS, C.setup_split_config(refs, 0, 0))


def tid_split_for_seed(seed, n_refs=25, n_train=5, n_val=8):
    """Per-seed TID2013 ref split, drawn ONCE and shared verbatim by both
    arms (paired design; reference random split is train.py random path)."""
    perm = np.random.default_rng(1000 + seed).permutation(n_refs)
    return {
        "train": sorted(int(i) for i in perm[:n_train]),
        "val": sorted(int(i) for i in perm[n_train:n_train + n_val]),
        "test": sorted(int(i) for i in perm[n_train + n_val:]),
    }


def configure_finetune(C, split, ckpt, epochs):
    g = C.global_config
    g["dataset"] = C.DATASET_TID2013
    C.dataset_split_config_base["split_type"] = C.SPLIT_TYPE_INDICES
    from vtamiq_tpu.data.datasets import TID2013Dataset
    C._DATASET_REGISTRY[C.DATASET_TID2013] = (
        TID2013Dataset,
        C.setup_split_config(split["train"], split["val"], split["test"]))
    g["do_train"], g["do_val"], g["do_test"] = True, True, True
    g["num_epochs"] = epochs
    g["load_checkpoint_file"] = ckpt


def leg_pretrain(seed, args):
    """Arm-1 KADIS weak-label pretrain (train-only, all refs)."""
    C = fresh_configs(seed)
    install_kadis(C, args.refs)
    g = C.global_config
    g["dataset"] = C.DATASET_KADIS700K
    C.dataset_split_config_base["split_type"] = C.SPLIT_TYPE_INDICES
    g["do_train"], g["do_val"], g["do_test"] = True, False, False
    g["num_epochs"] = args.kadis_epochs
    g["train_save_latest"] = True
    g["load_checkpoint_file"] = None
    from vtamiq_tpu.train import engine
    t0 = time.time()
    engine.train()
    return {"checkpoint": os.path.join(g["output_dir_final"], "latest.npz"),
            "pretrain_seconds": time.time() - t0}


def leg_finetune(seed, args, ckpt):
    """One finetune arm over the seed's shared TID2013 split; ckpt=None is
    the cold-start control, a path is the pretrained arm."""
    C = fresh_configs(seed)
    configure_finetune(C, tid_split_for_seed(seed), ckpt, args.finetune_epochs)
    from vtamiq_tpu.train import engine
    t0 = time.time()
    cors = engine.train()
    return {
        "test_SROCC": float(cors["SROCC"]),
        "test_PLCC": float(cors["PLCC"]),
        "val_SROCC_per_epoch": val_trajectory(
            C.global_config["output_dir_final"]),
        "finetune_seconds": time.time() - t0,
    }


def run_leg(leg, seed, args, ckpt=None, retries=1):
    """Run one leg in a CHILD process: legs accumulate tens of GB of host
    state (image caches + relay buffers survive the importlib.reload
    cycles), and three legs x three seeds in one process OOMed on this
    128 GB box (round 4). A child bounds RSS to one leg and keeps the
    parent TPU-free (a killed parent cannot wedge the chip)."""
    out_path = os.path.join(REPO, f".kadis_leg_{seed}_{leg}.json")
    cmd = [sys.executable, os.path.abspath(__file__), "--leg", leg,
           "--seed", str(seed), "--refs", str(args.refs),
           "--kadis-epochs", str(args.kadis_epochs),
           "--finetune-epochs", str(args.finetune_epochs),
           "--leg-out", out_path]
    if ckpt:
        cmd += ["--ckpt", ckpt]
    for attempt in range(retries + 1):
        rc = subprocess.run(cmd).returncode
        if rc == 0:
            break
        print(f"leg {leg} seed {seed}: child rc={rc} "
              f"(attempt {attempt + 1}/{retries + 1})", flush=True)
    else:
        raise RuntimeError(f"leg {leg} seed {seed} failed after retries")
    with open(out_path) as f:
        res = json.load(f)
    os.remove(out_path)
    return res


def run_seed(seed, args):
    res = {"seed": seed, "tid_split": tid_split_for_seed(seed)}

    pre = run_leg("pretrain", seed, args)
    ckpt = pre["checkpoint"]
    res["pretrain_seconds"] = pre["pretrain_seconds"]

    res["pretrained"] = run_leg("finetune", seed, args, ckpt=ckpt)
    res["pretrained"]["checkpoint"] = ckpt
    print(f"seed {seed} pretrained:", res["pretrained"], flush=True)

    res["cold_start"] = run_leg("finetune", seed, args)
    print(f"seed {seed} cold:", res["cold_start"], flush=True)

    res["endpoint_delta_SROCC"] = (res["pretrained"]["test_SROCC"]
                                   - res["cold_start"]["test_SROCC"])
    pre_t = res["pretrained"]["val_SROCC_per_epoch"]
    cold_t = res["cold_start"]["val_SROCC_per_epoch"]
    if pre_t and cold_t:
        res["epoch1_val_SROCC_delta"] = round(pre_t[0][1] - cold_t[0][1], 6)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", default="7,8,9")
    ap.add_argument("--refs", type=int, default=1000,
                    help="KADIS refs (x5 = weak-label pairs)")
    ap.add_argument("--kadis-epochs", type=int, default=1)
    ap.add_argument("--finetune-epochs", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "KADIS_WORKFLOW.json"))
    # internal child-process mode (see run_leg)
    ap.add_argument("--leg", choices=["pretrain", "finetune"], default=None)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--leg-out", default=None)
    args = ap.parse_args()

    if args.leg:  # child: one leg, one seed, bounded RSS
        if args.leg == "pretrain":
            res = leg_pretrain(args.seed, args)
        else:
            res = leg_finetune(args.seed, args, args.ckpt)
        with open(args.leg_out, "w") as f:
            json.dump(res, f)
        return

    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]

    from vtamiq_tpu.data import synth
    t0 = time.time()
    synth.generate_kadis700k(os.path.join(ROOT, "kadis700k"),
                             num_refs=args.refs)
    synth.generate_tid2013(os.path.join(ROOT, "tid2013"))  # full (markers)
    gen_s = time.time() - t0

    out = {"generated_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
           "kadis_refs": args.refs, "kadis_pairs": args.refs * 5,
           "kadis_epochs": args.kadis_epochs,
           "finetune_epochs": args.finetune_epochs,
           "generation_seconds": round(gen_s, 1),
           "protocol": ("paired per-seed design: both arms share the seed's "
                        "TID2013 split (5 train / 8 val / 12 test refs) and "
                        "finetune budget; headline = mean +- std of paired "
                        "ENDPOINT test-SROCC deltas"),
           "per_seed": []}

    # resume support: a crashed run's completed seeds carry over
    partial = args.out + ".partial"
    if os.path.exists(partial):
        with open(partial) as f:
            prev = json.load(f)
        if (prev.get("kadis_refs") == args.refs
                and prev.get("finetune_epochs") == args.finetune_epochs):
            out["per_seed"] = list(prev.get("per_seed", []))
            print(f"resumed {len(out['per_seed'])} seeds from partial",
                  flush=True)

    done = {r["seed"] for r in out["per_seed"]}
    for seed in seeds:
        if seed in done:
            continue
        out["per_seed"].append(run_seed(seed, args))
        with open(partial, "w") as f:
            json.dump(out, f, indent=2)

    deltas = [r["endpoint_delta_SROCC"] for r in out["per_seed"]]
    e1 = [r["epoch1_val_SROCC_delta"] for r in out["per_seed"]
          if "epoch1_val_SROCC_delta" in r]
    out["endpoint_delta_SROCC_mean"] = float(np.mean(deltas))
    out["endpoint_delta_SROCC_std"] = float(np.std(deltas, ddof=1)) \
        if len(deltas) > 1 else None
    if e1:
        out["epoch1_delta_SROCC_mean"] = float(np.mean(e1))
    out["pass"] = bool(out["endpoint_delta_SROCC_mean"] > 0)
    out["interpretation"] = (
        f"Weak-label pretraining on {args.refs * 5} synthetic KADIS pairs "
        f"improves the paired finetune ENDPOINT by "
        f"{out['endpoint_delta_SROCC_mean']:+.4f} SROCC "
        f"(std {out['endpoint_delta_SROCC_std']}, n={len(deltas)}) over "
        "cold start at an identical budget on identical splits.")
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("RESULT:", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
