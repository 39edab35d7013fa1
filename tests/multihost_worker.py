"""Worker for tests/test_multihost.py: one process of a 2-process CPU
data-parallel training job (SURVEY.md §2.5 "multi-host via jax.distributed").

Run (per process i in {0, 1}):
    XLA_FLAGS=--xla_force_host_platform_device_count=2 \
    python multihost_worker.py <i> <nproc> <port> <out_json>

Each process: initializes jax.distributed (gloo CPU collectives), builds a
4-device global mesh (2 local CPU devices x 2 processes), iterates its
per-process shard of a synthetic dataset, assembles global batches via
jax.make_array_from_process_local_data, and runs a REAL fused sharded train
step. Writes its view of the losses to out_json; the parent asserts the
processes agree (the psum made training globally consistent).
"""

import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # defeat the axon sitecustomize pin


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    import numpy as np
    import jax.numpy as jnp

    from vtamiq_tpu.parallel import distributed as D
    from vtamiq_tpu.parallel.mesh import make_mesh, shard_params
    from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
    from vtamiq_tpu.models.vtamiq import init_vtamiq_params
    from vtamiq_tpu.ops.sampling import PatchSampler
    from vtamiq_tpu.train.steps import ExtractConfig, make_train_step
    from vtamiq_tpu.train.optim import make_optimizer, build_freeze_mask

    index, count = D.initialize(coordinator_address=f"127.0.0.1:{port}",
                                num_processes=nproc, process_id=pid,
                                cpu_collectives="gloo")
    assert (index, count) == (pid, nproc)
    assert jax.device_count() == 2 * nproc

    mesh = make_mesh(data=jax.device_count(), model=1)

    cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=1, num_extra_tokens=2,
                                          hidden_size=32, mlp_dim=64, num_heads=2),
                       num_rgs=1, num_rcabs=1, ca_reduction=4)
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    gconf = dict(optimizer="AdamW", optimizer_weight_decay=0.0,
                 optimizer_learning_rate=1e-3, scheduler_step_per_batch=False,
                 scheduler_type="lambda",
                 optimizer_learning_rate_decay_lambda_goal=1.0, num_epochs=1,
                 optimizer_decay_after_n_epochs=[9],
                 optimizer_learning_rate_decay_multistep=0.1,
                 optimizer_learning_rate_decay_cosine=0.01,
                 optimizer_sgd_momentum=0.9, optimizer_sgd_nesterov=True)
    optimizer, _ = make_optimizer(gconf, 1)
    opt_state = optimizer.init(params)
    mask = build_freeze_mask(params, False, None)

    wrap = make_train_step(cfg, PatchSampler(),
                           ExtractConfig(patch_count=16, patch_dim=16),
                           optimizer, compute_dtype=jnp.float32, mesh=mesh)
    step = wrap(params, opt_state, mask)
    params = shard_params(params, mesh)
    opt_state = jax.device_put(
        opt_state, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))

    # synthetic dataset: 16 items; EVERY process derives the same epoch
    # permutation then takes its strided shard (the loader's scheme)
    g_batch = 4
    l_batch = D.local_batch_size(g_batch)
    all_idx = np.random.default_rng(7).permutation(16)
    my_idx = D.process_shard(all_idx, index, count)
    item_rng = lambda i: np.random.default_rng(1000 + int(i))

    losses = []
    for b in range(len(my_idx) // l_batch):
        ids = my_idx[b * l_batch:(b + 1) * l_batch]
        raw = np.stack([item_rng(i).uniform(0, 1, (2, 48, 48, 3)) for i in ids]
                       ).astype(np.float32)
        qs = np.asarray([(int(i) % 9) / 8.0 for i in ids], np.float32)
        hw = np.tile(np.asarray([48, 48], np.int32)[None], (l_batch, 1))
        graw, gqs, ghw = D.global_batch(mesh, (raw, qs, hw), g_batch)
        params, opt_state, metrics, q_p = step(
            params, opt_state, mask, graw, gqs, jnp.asarray(g_batch),
            jax.random.PRNGKey(100 + b), jnp.array([0.75, 1.0, 0.2]), ghw)
        losses.append(float(metrics["loss"]))

    with open(out_path, "w") as f:
        json.dump({"process": index, "losses": losses,
                   "devices": jax.device_count()}, f)
    print(f"proc {index}: losses={losses}", flush=True)


if __name__ == "__main__":
    main()
