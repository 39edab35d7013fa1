"""Full-scale KADIS-700k pretrain -> finetune workflow on hardware.

The reference's flagship weak-label recipe (run_custom.py:20-36 analog,
pretraining gates train_config.py:208-216) at full synthetic scale:
KADIS (120 refs x 5 = 600 weak-label pairs) pretrain -> TID2013 (3000
pairs) finetune through the gates, vs a cold-start control with the same
finetune budget. Writes KADIS_WORKFLOW.json with both test SROCCs.

Run detached (CLAUDE.md rule 2):
  nohup python tools/run_kadis_workflow.py > /tmp/kadis_workflow.log 2>&1 &
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROOT = os.environ.get("VTAMIQ_DATASETS_PATH",
                      os.path.join(REPO, ".parity_data"))
os.environ["VTAMIQ_DATASETS_PATH"] = ROOT  # read live by resolve_datasets_root


def fresh_configs():
    import importlib
    from vtamiq_tpu.train import config as C
    importlib.reload(C)
    from vtamiq_tpu.train import engine
    importlib.reload(engine)
    C.global_config["seed"] = 7
    C.global_config["is_verbose"] = False
    C.global_config["output_dir"] = os.path.join(REPO, ".kadis_workflow_out")
    C.global_config["num_repeats_test"] = 2
    return C


def val_trajectory(run_dir):
    """Per-epoch val-SROCC from the run's scalars.jsonl — the convergence
    comparison is the transfer evidence when the endpoint saturates."""
    vals = []
    path = os.path.join(run_dir, "scalars.jsonl")
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                d = json.loads(line)
                if d["tag"].endswith("val-SROCC"):
                    vals.append((d["step"], round(d["value"], 6)))
    return vals


def main():
    from vtamiq_tpu.data import synth
    synth.generate_kadis700k(os.path.join(ROOT, "kadis700k"), num_refs=120)
    synth.generate_tid2013(os.path.join(ROOT, "tid2013"))  # full (markers)

    from vtamiq_tpu.data.datasets import KADIS700kDataset

    out = {"generated_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
           "kadis_refs": 120, "kadis_pairs": 600}

    # scaled-down subclass matching the generated corpus
    def install_kadis(C):
        class SynthKADIS(KADIS700kDataset):
            num_ref_images = 120
            num_dist_images = 5
        C._DATASET_REGISTRY[C.DATASET_KADIS700K] = (
            SynthKADIS, C.setup_split_config(120, 0, 0))

    # --- pretrained path ---
    C = fresh_configs()
    install_kadis(C)
    from vtamiq_tpu.train.run_custom import pretrain_kadis_then_finetune
    t0 = time.time()
    ckpt, cors_pre = pretrain_kadis_then_finetune(
        kadis_epochs=2, finetune_dataset=C.DATASET_TID2013,
        finetune_epochs=2)
    out["pretrained"] = {
        "checkpoint": ckpt,
        "test_SROCC": float(cors_pre["SROCC"]),
        "test_PLCC": float(cors_pre["PLCC"]),
        "val_SROCC_per_epoch": val_trajectory(C.global_config["output_dir_final"]),
        "seconds": time.time() - t0,
    }
    print("pretrained:", out["pretrained"], flush=True)

    # --- cold-start control (same finetune budget) ---
    C = fresh_configs()
    g = C.global_config
    g["dataset"] = C.DATASET_TID2013
    C.dataset_split_config_base["split_type"] = C.SPLIT_TYPE_RANDOM
    g["do_train"], g["do_val"], g["do_test"] = True, True, True
    g["num_epochs"] = 2
    g["load_checkpoint_file"] = None
    t0 = time.time()
    from vtamiq_tpu.train import engine
    cors_cold = engine.train()
    out["cold_start"] = {
        "test_SROCC": float(cors_cold["SROCC"]),
        "test_PLCC": float(cors_cold["PLCC"]),
        "val_SROCC_per_epoch": val_trajectory(C.global_config["output_dir_final"]),
        "seconds": time.time() - t0,
    }
    print("cold:", out["cold_start"], flush=True)

    out["improvement_SROCC"] = (out["pretrained"]["test_SROCC"]
                                - out["cold_start"]["test_SROCC"])
    pre_t = out["pretrained"]["val_SROCC_per_epoch"]
    cold_t = out["cold_start"]["val_SROCC_per_epoch"]
    if pre_t and cold_t:
        # equal-1-epoch-budget comparison: transfer evidence that survives
        # endpoint saturation on easy synthetic finetune corpora
        out["epoch1_val_SROCC_delta"] = pre_t[0][1] - cold_t[0][1]
    with open(os.path.join(REPO, "KADIS_WORKFLOW.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("RESULT:", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
