"""Regenerate the int8 accuracy artifact (VERDICT r4 #6 follow-through).

ops/quant.py's accuracy ledger cites ``docs/int8_accuracy_r5.json``, but
the checkpoint that produced the round-4 measurement
(.kadis_workflow_out/.../best.npz) was an untracked run artifact and VM
restarts git-clean the worktree (CLAUDE.md round-3 gotchas) — the
artifact could not be regenerated after the fact. This script retrains an
equivalent TID2013 B16-6L checkpoint through the production engine on the
synthetic parity dataset (engine defaults: batch 16, 384 patches; 2
epochs, same as the lost ckpt's "2e" tag), then runs
tools/int8_accuracy.py against it, which writes the artifact JSON.

The artifact's claim is int8-vs-bf16 RANK AGREEMENT on a trained model —
any reasonably-trained checkpoint of the same architecture serves; the
ledger numbers in ops/quant.py are refreshed from the new artifact.

Run detached (CLAUDE.md rule 2 — never kill a TPU-touching process):
  PYTHONPATH=/root/repo:$PYTHONPATH nohup python tools/regen_int8_ckpt.py \
      > /tmp/int8_regen.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ROOT = os.environ.get("VTAMIQ_DATASETS_PATH",
                      os.path.join(REPO, ".parity_data"))
os.environ["VTAMIQ_DATASETS_PATH"] = ROOT


def main():
    import parity_run
    parity_run.ensure_datasets(ROOT, ["tid2013"], True)
    parity_run.point_frameworks_at(ROOT)

    from vtamiq_tpu.train import config as C
    from vtamiq_tpu.train import engine

    g = C.global_config
    g["is_verbose"] = False
    g["output_dir"] = os.path.join(REPO, ".int8_regen_out")
    g["dataset"] = C.DATASET_TID2013
    g["do_train"], g["do_val"], g["do_test"] = True, True, False
    g["num_epochs"] = 2
    g["load_checkpoint_file"] = None

    t0 = time.time()
    engine.train()
    ckpt = os.path.join(g["output_dir_final"], "best.npz")
    print(f"trained in {time.time() - t0:.0f}s -> {ckpt}", flush=True)
    if not os.path.exists(ckpt):
        print("ERROR: best.npz missing", flush=True)
        return 1
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "int8_accuracy.py"),
         ckpt]).returncode


if __name__ == "__main__":
    sys.exit(main())
