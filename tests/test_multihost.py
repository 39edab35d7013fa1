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

    def test_loader_lockstep_varsize_buckets(self, tmp_path):
        """The per-process views of a variable-size bucketed epoch stay in
        LOCKSTEP: identical batch counts, identical per-step bucket shapes,
        identical global_valid — the invariants a single global GSPMD step
        program needs (shape/count divergence across hosts deadlocks in the
        step's collectives)."""
        from test_varsize import make_multisize_tid
        from vtamiq_tpu.data.pipeline import PatchDatasetLoader

        ds = make_multisize_tid(
            str(tmp_path), sizes=[(64, 96), (80, 64), (64, 96), (96, 96),
                                  (64, 96)], num_dist=3)
        ds.add_split()
        views = []
        for p in range(2):
            loader = PatchDatasetLoader(ds, "FullDataset", batch_size=2,
                                        patch_count=16, prefetch=0, seed=11,
                                        shuffle=True, max_size_buckets=2,
                                        process_index=p, process_count=2)
            batches = list(loader)
            assert len(batches) == len(loader)  # __len__ exact in bucket mode
            views.append(batches)

        assert len(views[0]) == len(views[1])
        seen = [[], []]
        for b0, b1 in zip(views[0], views[1]):
            # same global batch -> same padded shape and same global valid
            assert b0.imgs_raw.shape == b1.imgs_raw.shape
            assert b0.global_valid == b1.global_valid
            assert b0.valid + b1.valid == b0.global_valid
            # global pads are a suffix: local valids are leading counts
            for p, b in enumerate((b0, b1)):
                seen[p].extend(b.indices[:b.valid].tolist())
                # pad region true sizes within the bucket shape
                if b.img_hw is not None:
                    assert (b.img_hw[:, 0] <= b.imgs_raw.shape[2]).all()
                    assert (b.img_hw[:, 1] <= b.imgs_raw.shape[3]).all()
        assert not set(seen[0]) & set(seen[1])
        assert sorted(seen[0] + seen[1]) == list(range(15))

    def test_loader_len_exact_in_bucket_mode_single_process(self, tmp_path):
        """__len__ counts per-bucket partial batches (the LR schedule is
        sized from len(loader); an undercount would finish decay early)."""
        from test_varsize import make_multisize_tid
        from vtamiq_tpu.data.pipeline import PatchDatasetLoader

        ds = make_multisize_tid(
            str(tmp_path), sizes=[(64, 96), (64, 96), (80, 64)], num_dist=3)
        ds.add_split()
        loader = PatchDatasetLoader(ds, "FullDataset", batch_size=4,
                                    patch_count=16, prefetch=0, seed=0,
                                    max_size_buckets=2)
        batches = list(loader)
        # 6 items in one bucket + 3 in the other -> 2 + 1 = 3 padded batches
        assert len(batches) == len(loader) == 3

    def test_loader_flips_agree_across_processes(self, tmp_path):
        """Every process draws the SAME flip sequence (schedule-phase rng),
        so the item a process decodes is identical no matter which process
        owns it."""
        from test_varsize import make_multisize_tid
        from vtamiq_tpu.data.pipeline import PatchDatasetLoader

        ds = make_multisize_tid(str(tmp_path), sizes=[(64, 96)] * 4, num_dist=2)
        ds.add_split()

        def collect(p, count):
            loader = PatchDatasetLoader(ds, "FullDataset", batch_size=4 // count,
                                        patch_count=16, prefetch=0, seed=5,
                                        shuffle=True, allow_img_flip=True,
                                        process_index=p, process_count=count)
            out = {}
            for batch in loader:
                for i in range(batch.valid):
                    out[int(batch.indices[i])] = np.asarray(
                        batch.imgs_raw[i])
            return out

        single = collect(0, 1)
        merged = {}
        for p in range(2):
            merged.update(collect(p, 2))
        assert sorted(merged) == sorted(single)
        for idx in single:
            np.testing.assert_array_equal(single[idx], merged[idx])


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

    def test_two_process_engine_train(self, tmp_path):
        """FULL engine.train() across 2 processes: lockstep loaders, global
        batch assembly, all-gathered correlations (must agree bit-for-bit
        across hosts), coordinator-only checkpoints."""
        from test_datasets import make_tid
        make_tid(str(tmp_path), num_ref=5, num_dist=4)

        worker = os.path.join(REPO, "tests", "multihost_engine_worker.py")
        port = _free_port()
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = (REPO + os.pathsep +
                             os.path.join(REPO, "tests") + os.pathsep +
                             env.get("PYTHONPATH", ""))
        outs = [str(tmp_path / f"eng{i}.json") for i in range(2)]
        procs = [subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), str(tmp_path),
             outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
            for i in range(2)]
        logs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            logs.append(out.decode(errors="replace"))
        assert all(p.returncode == 0 for p in procs), "\n---\n".join(logs)

        results = [json.load(open(o)) for o in outs]
        # epoch correlations identical across hosts (predictions all-gathered)
        assert results[0]["SROCC"] == results[1]["SROCC"]
        assert results[0]["PLCC"] == results[1]["PLCC"]
        assert np.isfinite(results[0]["SROCC"])
        # coordinator-only checkpoints
        ckpts0 = [f for f in os.listdir(results[0]["output_dir_final"])
                  if f.endswith(".npz")]
        ckpts1 = [f for f in os.listdir(results[1]["output_dir_final"])
                  if f.endswith(".npz")]
        assert ckpts0 and not ckpts1
