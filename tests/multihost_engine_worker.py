"""Worker for tests/test_multihost.py::test_two_process_engine_train: one
process of a 2-process CPU run of the FULL training engine (engine.train()),
exercising the whole multi-host path end-to-end: jax.distributed init ->
lockstep loader schedule -> global batch assembly -> GSPMD train/eval steps
-> all-gathered epoch correlations -> coordinator-only checkpoints.

Run (per process i): XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python multihost_engine_worker.py <i> <nproc> <port> <dataset_root> <out_json>
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # defeat the axon sitecustomize pin


def main():
    pid, nproc, port, root, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                        sys.argv[3], sys.argv[4], sys.argv[5])
    from vtamiq_tpu.parallel import distributed as D
    index, count = D.initialize(coordinator_address=f"127.0.0.1:{port}",
                                num_processes=nproc, process_id=pid,
                                cpu_collectives="gloo")
    assert (index, count) == (pid, nproc)

    from vtamiq_tpu.data.datasets import TID2013Dataset
    from vtamiq_tpu.train import config as C, engine

    num_ref, num_dist = 5, 4

    class TinyTID(TID2013Dataset):
        num_ref_images = num_ref
        num_dist_images = num_dist

        def __init__(self, **kwargs):
            kwargs.setdefault("datasets_root", root)
            super().__init__(**kwargs)

    split_cfg = C.setup_split_config(3, (3, 4), (4, 5))
    C._DATASET_REGISTRY[C.DATASET_TID2013] = (TinyTID, split_cfg)

    g = C.global_config
    g["dataset"] = C.DATASET_TID2013
    # do_test exercises the coordinator-load + broadcast checkpoint path
    g["do_train"], g["do_val"], g["do_test"] = True, True, True
    g["num_repeats_test"] = 1
    g["output_dir"] = os.path.join(root, f"output_p{pid}")
    g["num_epochs"] = 1
    g["compute_dtype"] = "float32"
    g["is_verbose"] = False
    g["seed"] = 3
    C.vit_config.update(num_keep_layers=1, num_extra_tokens=2,
                        hidden_size=32, mlp_dim=64, num_heads=2)
    C.vtamiq_config.update(num_rgs=1, num_rcabs=1, ca_reduction=4)
    C.dataloader_config_base[C.DATALOADER_PARAMS][C.USE_DEFAULT_PARAMS] = True
    for split in (C.SPLIT_NAME_TRAIN, C.SPLIT_NAME_VAL, C.SPLIT_NAME_TEST):
        C.dataloader_config_base[split][C.BATCH_SIZE] = 2  # local; global = 4
        C.dataloader_config_base[split][C.PATCH_COUNT] = 16

    cors = engine.train()
    out = {"process": index,
           "devices": jax.device_count(),
           "SROCC": float(cors["SROCC"]),
           "PLCC": float(cors["PLCC"]),
           "output_dir_final": g["output_dir_final"]}
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"proc {index}: {out}", flush=True)


if __name__ == "__main__":
    main()
