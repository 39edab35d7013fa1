"""Example: multi-host data-parallel training (one process per host).

The reference has no distributed support (SURVEY.md §2.5); this is new
TPU-native capability. On Cloud TPU pods every process auto-detects its
coordinates (`jax.distributed.initialize()` with no args); elsewhere pass
--coordinator/--num-processes/--process-id explicitly.

What the engine does once jax.distributed is live (docs/OPERATIONS.md
"Multi-host operation"): global data mesh over all hosts' chips, lockstep
global batch schedule with per-process decode slices, global batch assembly
via jax.make_array_from_process_local_data, globally-masked losses,
all-gathered epoch correlations (identical on every host), and
coordinator-only checkpoints.

Usage (per host):
    python examples/multihost_train.py [--coordinator host0:1234
        --num-processes 4 --process-id $I] [--epochs 20] [--batch-size 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (omit on Cloud TPU pods)")
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--vit-npz", default=None)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=16,
                    help="LOCAL batch per host; global = this x num hosts")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    # must run BEFORE anything touches the jax backend
    from vtamiq_tpu.parallel import distributed as D
    index, count = D.initialize(coordinator_address=args.coordinator,
                                num_processes=args.num_processes,
                                process_id=args.process_id)
    print(f"process {index}/{count}, global devices incoming...")

    from vtamiq_tpu.train import config as C, engine

    g = C.global_config
    g.update(
        dataset=C.DATASET_TID2013,
        do_train=True, do_val=True, do_test=True,
        num_epochs=args.epochs,
        seed=args.seed,
        vit_weights_path=args.vit_npz,
    )
    # honor the CLI batch size: without this flag validate_configs overwrites
    # batch/patch counts from dataloader_config_vtamiq (reference semantics,
    # train_config.py:782-801)
    C.dataloader_config_base[C.DATALOADER_PARAMS][C.USE_DEFAULT_PARAMS] = True
    for split in (C.SPLIT_NAME_TRAIN, C.SPLIT_NAME_VAL, C.SPLIT_NAME_TEST):
        C.dataloader_config_base[split][C.BATCH_SIZE] = args.batch_size

    correlations = engine.train()  # identical on every host (all-gathered)
    if D.is_coordinator():
        print("Test correlations:", correlations)


if __name__ == "__main__":
    main()
