"""Multi-host data parallelism: 2 real processes on CPU (gloo collectives),
4 global devices, per-process input sharding, one GSPMD train step
(SURVEY.md §2.5: "multi-host via jax.distributed"; new capability — the
reference has no distributed support)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestProcessShard:
    def test_disjoint_and_complete(self):
        from vtamiq_tpu.parallel.distributed import process_shard
        idx = np.arange(17)
        parts = [process_shard(idx, i, 4) for i in range(4)]
        merged = np.sort(np.concatenate(parts))
        np.testing.assert_array_equal(merged, idx)
        sizes = [len(p) for p in parts]
        assert max(sizes) - min(sizes) <= 1

    def test_single_process_identity(self):
        from vtamiq_tpu.parallel.distributed import process_shard
        idx = np.arange(5)
        np.testing.assert_array_equal(process_shard(idx, 0, 1), idx)

    def test_loader_process_sharding(self, tmp_path):
        """Two loader views of the same split shard disjointly and cover it."""
        from test_datasets import make_tid
        from vtamiq_tpu.data.pipeline import PatchDatasetLoader
        ds = make_tid(str(tmp_path), num_ref=3, num_dist=4)
        ds.add_split()
        seen = []
        for p in range(2):
            loader = PatchDatasetLoader(ds, "FullDataset", batch_size=2,
                                        patch_count=16, prefetch=0, seed=3,
                                        shuffle=True,
                                        process_index=p, process_count=2)
            ids = []
            for batch in loader:
                ids.extend(batch.indices[:batch.valid].tolist())
            seen.append(ids)
        assert not set(seen[0]) & set(seen[1])
        assert sorted(seen[0] + seen[1]) == list(range(12))


@pytest.mark.slow
class TestTwoProcessTraining:
    def test_two_process_train_step(self, tmp_path):
        """Spawn 2 processes; each runs its shard of global batches through
        ONE sharded train step program; losses must be identical across
        processes (global psum) and finite."""
        port = _free_port()
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
        procs = [subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(2)]
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            logs.append(out.decode(errors="replace"))
        assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

        results = [json.load(open(o)) for o in outs]
        assert results[0]["devices"] == results[1]["devices"] == 4
        l0, l1 = results[0]["losses"], results[1]["losses"]
        assert len(l0) == len(l1) == 4  # 16 items / 2 procs / 2 local-batch
        np.testing.assert_allclose(l0, l1, rtol=1e-6)
        assert np.isfinite(l0).all()
