"""Tests for utility modules: accumulators, timer, writer, image tools,
color spaces / PU encoding, seeding, model introspection, AFF variants."""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vtamiq_tpu.utils import (
    Mean, Max, Timer, SplitSummaryWriter, TemporaryNumpySeed, fold_seed,
    StepTimer, Logger, FileLogger, batched, color_iterator,
    float2str, float2str3, check_unused_kwargs,
)
from vtamiq_tpu.utils.image_tools import (
    normalize_array, extract_windows, center_crop, crop_image, reinhard_tmo,
)
from vtamiq_tpu.utils.color_spaces import (
    srgb_to_linear, linear_to_srgb, rgb_to_luminance, rgb_to_xyz, xyz_to_rgb,
    xyz_to_lab, lab_to_xyz, rgb_to_lab, pu21_encode, pu21_decode, pu_encode_srgb,
)
from vtamiq_tpu.models.utils import (
    count_parameters, parameter_table, print_parameters, save_model_params,
    vit_flops, vtamiq_flops, print_flops,
)
from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig


class TestAccumulators:
    def test_mean(self):
        m = Mean()
        m.add(1.0)
        m.add(3.0)
        assert m.value() == 2.0
        m.reset()
        assert m.value() == 0.0

    def test_max_drives_best_checkpoint(self):
        mx = Max()
        assert mx.add(0.5) is True
        assert mx.add(0.4) is False
        assert mx.add(0.9) is True
        assert mx.value() == 0.9


class TestTimer:
    def test_basic(self):
        t = Timer()
        with t:
            time.sleep(0.01)
        assert 0.005 < t.total < 1.0
        assert t.min <= t.avg <= t.max

    def test_pause_resume(self):
        t = Timer().start()
        t.pause()
        paused_at = t._elapsed
        time.sleep(0.01)
        t.resume()
        t.stop()
        assert len(t.deltas) == 1


class TestWriter:
    def test_mean_accumulation_and_flush(self, tmp_path):
        w = SplitSummaryWriter(str(tmp_path), log_every_n_steps=2)
        w.add_scalar("Training", "loss", 1.0, step=1)  # accumulated
        w.add_scalar("Training", "loss", 3.0, step=2)  # flushes mean=2.0
        w.close()
        lines = [json.loads(l) for l in open(tmp_path / "scalars.jsonl")]
        assert len(lines) == 1
        assert lines[0]["value"] == 2.0
        assert lines[0]["tag"].startswith("Training/")

    def test_force_add(self, tmp_path):
        w = SplitSummaryWriter(str(tmp_path), log_every_n_steps=100)
        w.add_scalar("Testing", "SROCC", 0.9, step=1, force_add=True)
        lines = list(open(tmp_path / "scalars.jsonl"))
        assert len(lines) == 1


class TestSeeding:
    def test_temporary_numpy_seed(self):
        np.random.seed(123)
        expected_next = np.random.randint(0, 1 << 30)
        np.random.seed(123)
        with TemporaryNumpySeed(7):
            a = np.random.randint(0, 1 << 30)
        with TemporaryNumpySeed(7):
            b = np.random.randint(0, 1 << 30)
        assert a == b
        assert np.random.randint(0, 1 << 30) == expected_next  # state restored

    def test_none_is_noop(self):
        np.random.seed(5)
        with TemporaryNumpySeed(None):
            x = np.random.rand()
        np.random.seed(5)
        assert np.random.rand() == x

    def test_fold_seed_stable(self):
        assert fold_seed("a", 1) == fold_seed("a", 1)
        assert fold_seed("a", 1) != fold_seed("a", 2)


class TestImageTools:
    def test_extract_windows_matches_manual(self):
        img = np.arange(36, dtype=float).reshape(6, 6)
        w = extract_windows(img, (3, 3), (2, 2))
        assert w.shape == (2, 2, 3, 3)
        np.testing.assert_array_equal(w[0, 0], img[:3, :3])
        np.testing.assert_array_equal(w[1, 1], img[2:5, 2:5])

    def test_crops(self):
        img = np.arange(48).reshape(6, 8)
        np.testing.assert_array_equal(crop_image(img, 1, 2, 2, 3), img[1:3, 2:5])
        c = center_crop(img, 4, 4)
        assert c.shape == (4, 4)

    def test_reinhard(self):
        x = np.array([0.0, 1.0, 100.0])
        y = reinhard_tmo(x)
        assert y[0] == 0.0 and y[1] == 0.5 and y[2] < 1.0


class TestColorSpaces:
    def test_srgb_roundtrip(self):
        x = np.linspace(0, 1, 64).astype(np.float32)
        np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x,
                                   rtol=1e-4, atol=1e-5)

    def test_xyz_roundtrip(self):
        rng = np.random.default_rng(0)
        rgb = rng.uniform(0, 1, (16, 3)).astype(np.float32)
        np.testing.assert_allclose(xyz_to_rgb(rgb_to_xyz(rgb)), rgb,
                                   rtol=1e-4, atol=1e-5)

    def test_lab_roundtrip_and_white(self):
        rng = np.random.default_rng(1)
        rgb = rng.uniform(0.05, 1, (16, 3)).astype(np.float32)
        xyz = rgb_to_xyz(rgb)
        np.testing.assert_allclose(lab_to_xyz(xyz_to_lab(xyz)), xyz,
                                   rtol=1e-3, atol=1e-4)
        white = rgb_to_lab(np.array([1.0, 1.0, 1.0]))
        assert abs(white[0] - 100.0) < 0.5  # L* of white
        assert abs(white[1]) < 0.5 and abs(white[2]) < 0.5

    def test_luminance_weights(self):
        assert abs(rgb_to_luminance(np.array([1.0, 1.0, 1.0])) - 1.0) < 1e-4
        g = rgb_to_luminance(np.array([0.0, 1.0, 0.0]))
        r = rgb_to_luminance(np.array([1.0, 0.0, 0.0]))
        assert g > r  # green dominates luminance

    def test_pu21_monotone_and_roundtrip(self):
        y = np.logspace(-2, 4, 32)
        v = pu21_encode(y)
        assert (np.diff(v) > 0).all()
        y2 = pu21_decode(v)
        np.testing.assert_allclose(y2, np.clip(y, 0.005, 10000), rtol=1e-3)

    def test_pu_encode_srgb_range(self):
        img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
        pu = pu_encode_srgb(img, peak_luminance=100.0)
        assert pu.shape == img.shape
        assert pu.min() >= 0.0 and pu.max() <= 1.0 + 1e-5


class TestModelUtils:
    def test_count_and_table(self):
        cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=1, hidden_size=32,
                                              mlp_dim=64, num_heads=2,
                                              num_extra_tokens=2),
                           num_rgs=1, num_rcabs=1, ca_reduction=4)
        from vtamiq_tpu.models.vtamiq import init_vtamiq_params
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        total = count_parameters(params)
        rows = parameter_table(params)
        assert total == sum(r[2] for r in rows)
        assert total > 0

    def test_b16_param_count_plausible(self):
        """ViT-B/16 @ 6 layers + head should land in the ~45-60M range
        (reference model scale)."""
        cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
        from vtamiq_tpu.models.vtamiq import init_vtamiq_params
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        total = count_parameters(params)
        assert 40e6 < total < 70e6, total

    def test_flops_scale_with_patches(self):
        cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=6, num_extra_tokens=8))
        f500 = vtamiq_flops(cfg, 500)
        f1000 = vtamiq_flops(cfg, 1000)
        assert f1000 > 2 * f500 * 0.9  # superlinear (quadratic attention term)
        assert f500 > 1e9  # ViT-B at 500 patches is tens of GFLOPs

    def test_print_and_save(self, tmp_path):
        cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=1, hidden_size=32,
                                              mlp_dim=64, num_heads=2))
        from vtamiq_tpu.models.vtamiq import init_vtamiq_params
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        lines = []
        print_parameters(params, full=True, log=lines.append)
        assert any("Total parameters" in l for l in lines)
        print_flops(cfg, 100, log=lines.append)
        save_model_params(params, str(tmp_path))
        assert os.path.isfile(tmp_path / "model_params.txt")


class TestAFFVariants:
    def test_ms_cam_rcab(self):
        from vtamiq_tpu.models.vtamiq import init_rcab, rcab
        params = init_rcab(jax.random.PRNGKey(0), 32, 4, use_ms_cam=True,
                           use_local=True)
        assert "ms_cam" in params and "local" in params["ms_cam"]
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32)), jnp.float32)
        out = rcab(params, x)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()

    def test_aff_fuses_between_inputs(self):
        from vtamiq_tpu.models.vtamiq import init_aff, aff
        params = init_aff(jax.random.PRNGKey(0), 16, reduction=2, use_local=True)
        x = jnp.zeros((2, 16))
        y = jnp.ones((2, 16))
        out = np.asarray(aff(params, x, y))
        assert ((0.0 <= out) & (out <= 1.0)).all()  # lerp stays between inputs

    def test_iaff(self):
        from vtamiq_tpu.models.vtamiq import init_iaff, iaff
        params = init_iaff(jax.random.PRNGKey(0), 16)
        x = jnp.zeros((2, 16))
        y = jnp.ones((2, 16))
        out = np.asarray(iaff(params, x, y))
        assert ((0.0 <= out) & (out <= 1.0)).all()

    def test_vtamiq_with_ms_cam_forward(self):
        from vtamiq_tpu.models.vtamiq import init_vtamiq_params, vtamiq_forward
        cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=1, hidden_size=32,
                                              mlp_dim=64, num_heads=2),
                           num_rgs=1, num_rcabs=1, ca_reduction=4,
                           use_ms_cam=True, use_local=True)
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        patches = jnp.asarray(rng.normal(size=(2, 2, 8, 16, 16, 3)), jnp.float32)
        pos = jnp.asarray(rng.uniform(0, 1 - 1e-6, size=(2, 2, 8, 2)), jnp.float32)
        q = vtamiq_forward(params, cfg, patches, pos, compute_dtype=jnp.float32)
        assert q.shape == (2,) and np.isfinite(np.asarray(q)).all()


class TestMisc:
    def test_batched(self):
        assert list(batched(range(5), 2)) == [[0, 1], [2, 3], [4]]

    def test_color_iterator_loops(self):
        it = color_iterator(("a", "b"))
        assert [next(it) for _ in range(4)] == ["a", "b", "a", "b"]

    def test_float2str(self):
        assert float2str(1.23456) == "1.2346"
        assert float2str3(1.23456) == "1.235"

    def test_loggers(self, tmp_path, capsys):
        fl = FileLogger(str(tmp_path / "log.txt"), verbose=False)
        fl("hello", 123)
        assert "hello 123" in open(tmp_path / "log.txt").read()
        Logger(verbose=True)("visible")
        assert "visible" in capsys.readouterr().out

    def test_step_timer(self):
        st = StepTimer(warmup_steps=1)
        st.tick(4)
        time.sleep(0.01)
        st.tick(4)
        assert st.items_per_sec > 0
        assert "items/sec" in st.summary()


class TestProfilingTrace:
    def test_trace_writes_profile(self, tmp_path):
        from vtamiq_tpu.utils.profiling import trace
        import jax.numpy as jnp
        with trace(str(tmp_path)):
            _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        # jax writes plugins/profile/<ts>/ under the logdir
        found = list((tmp_path).rglob("*.pb")) + list((tmp_path).rglob("*.json.gz")) \
            + list((tmp_path).rglob("*trace*"))
        assert found, list(tmp_path.rglob("*"))


class TestMatlabBridge:
    def test_raises_cleanly_without_matlab(self):
        from vtamiq_tpu.utils.matlab_bridge import MatlabWrapper
        with pytest.raises(ImportError):
            MatlabWrapper()


class TestLogOnTaskComplete:
    def test_logs_start_and_end(self):
        from vtamiq_tpu.utils import LogOnTaskComplete, Logger
        lines = []
        logger = Logger(verbose=True)
        logger.__call__ = None  # not used; use custom
        class L:
            verbose = True
            def __call__(self, *a, **k):
                lines.append(" ".join(str(x) for x in a))
        with LogOnTaskComplete("mytask", logger=L()):
            pass
        assert any("mytask" in l and "started" in l for l in lines)
        assert any("completed" in l for l in lines)

    def test_logs_failure(self):
        from vtamiq_tpu.utils import LogOnTaskComplete
        lines = []
        class L:
            def __call__(self, *a, **k):
                lines.append(" ".join(str(x) for x in a))
        with pytest.raises(RuntimeError):
            with LogOnTaskComplete("failtask", logger=L()):
                raise RuntimeError("boom")
        assert any("FAILED" in l for l in lines)
