"""Example: full train/val/test run on TID2013 (reference run_custom workflow).

Expects the TID2013 dataset under $VTAMIQ_DATASETS_PATH/tid2013 and
(optionally) jax-format ImageNet ViT weights.

Usage:
    python examples/train_tid2013.py [--vit-npz ViT-B_16.npz] [--epochs 20]
                                     [--mesh-data 1] [--mesh-model 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vtamiq_tpu.train import config as C, engine


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vit-npz", default=None)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--mesh-data", type=int, default=1)
    ap.add_argument("--mesh-model", type=int, default=1)
    ap.add_argument("--mesh-seq", type=int, default=1,
                    help="sequence-parallel axis: >1 routes attention "
                         "through the ppermute ring (ring-flash on TPU)")
    ap.add_argument("--seed", type=int, default=-1)
    args = ap.parse_args()

    g = C.global_config
    g.update(
        dataset=C.DATASET_TID2013,
        do_train=True, do_val=True, do_test=True,
        allow_use_full_dataset_test=False,
        num_epochs=args.epochs,
        optimizer_learning_rate=args.lr,
        scheduler_type="lambda",
        seed=args.seed,
        mesh_data=args.mesh_data,
        mesh_model=args.mesh_model,
        mesh_seq=args.mesh_seq,
        vit_weights_path=args.vit_npz,
    )
    correlations = engine.train()
    print("Test correlations:", correlations)


if __name__ == "__main__":
    main()
