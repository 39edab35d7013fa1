"""Injected-fault tests for the transient-device-fault retry wrapper
(VERDICT round-1 item 9; reference analog: skip-batch resilience,
train.py:503-510)."""

import pytest

from vtamiq_tpu.utils.retry import retry_transient, is_transient


class Flaky:
    """Raises ``exc`` for the first ``fail_times`` calls, then returns."""

    def __init__(self, fail_times, exc):
        self.fail_times = fail_times
        self.exc = exc
        self.calls = 0

    def __call__(self, x):
        self.calls += 1
        if self.calls <= self.fail_times:
            raise self.exc
        return x * 2


class TestRetryTransient:
    def test_recovers_from_transient_fault(self):
        fn = Flaky(2, RuntimeError("UNAVAILABLE: TPU device error"))
        sleeps = []
        out = retry_transient(fn, 21, max_retries=3, base_delay=0.5,
                              sleep=sleeps.append)
        assert out == 42
        assert fn.calls == 3
        assert sleeps == [0.5, 1.0]  # exponential backoff

    def test_exhausted_retries_raise(self):
        fn = Flaky(5, RuntimeError("UNAVAILABLE: TPU device error"))
        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            retry_transient(fn, 1, max_retries=2, sleep=lambda _: None)
        assert fn.calls == 3  # initial + 2 retries

    def test_non_transient_raises_immediately(self):
        fn = Flaky(1, ValueError("INVALID_ARGUMENT: shape mismatch"))
        with pytest.raises(ValueError):
            retry_transient(fn, 1, max_retries=5, sleep=lambda _: None)
        assert fn.calls == 1

    def test_oom_not_retried(self):
        fn = Flaky(1, RuntimeError("RESOURCE_EXHAUSTED: out of memory"))
        with pytest.raises(RuntimeError):
            retry_transient(fn, 1, max_retries=5, sleep=lambda _: None)
        assert fn.calls == 1

    def test_logs_each_retry(self):
        fn = Flaky(1, RuntimeError("UNAVAILABLE: flaky"))
        msgs = []
        retry_transient(fn, 1, max_retries=1, log=msgs.append,
                        sleep=lambda _: None)
        assert len(msgs) == 1 and "UNAVAILABLE" in msgs[0]

    def test_is_transient(self):
        assert is_transient(RuntimeError("... UNAVAILABLE: device ..."))
        assert is_transient(RuntimeError("DEADLINE_EXCEEDED while waiting"))
        assert not is_transient(RuntimeError("NaN loss"))


class TestEngineIntegration:
    def test_training_survives_injected_fault(self, tmp_path):
        """do_training completes an epoch when the first step dispatch
        raises a transient fault (fault injected by wrapping the step)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
        from vtamiq_tpu.models.vtamiq import init_vtamiq_params
        from vtamiq_tpu.ops.sampling import PatchSampler
        from vtamiq_tpu.train.steps import ExtractConfig, make_train_step
        from vtamiq_tpu.train.optim import make_optimizer, build_freeze_mask
        from vtamiq_tpu.train import engine
        from vtamiq_tpu.data.pipeline import ImageBatch

        cfg = VTAMIQConfig(vit=get_vit_config(num_keep_layers=1, num_extra_tokens=2,
                                              hidden_size=32, mlp_dim=64, num_heads=2),
                           num_rgs=1, num_rcabs=1, ca_reduction=4)
        params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
        gconf = dict(optimizer="AdamW", optimizer_weight_decay=0.0,
                     optimizer_learning_rate=1e-4, scheduler_step_per_batch=False,
                     scheduler_type="lambda",
                     optimizer_learning_rate_decay_lambda_goal=1.0, num_epochs=1,
                     optimizer_decay_after_n_epochs=[9],
                     optimizer_learning_rate_decay_multistep=0.1,
                     optimizer_learning_rate_decay_cosine=0.01,
                     optimizer_sgd_momentum=0.9, optimizer_sgd_nesterov=True)
        optimizer, _ = make_optimizer(gconf, 1)
        opt_state = optimizer.init(params)
        mask = build_freeze_mask(params, False, None)
        real_step = make_train_step(cfg, PatchSampler(),
                                    ExtractConfig(patch_count=16, patch_dim=16),
                                    optimizer, compute_dtype=jnp.float32)

        calls = {"n": 0}

        def flaky_step(*args):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("UNAVAILABLE: TPU device error (injected)")
            return real_step(*args)

        rng = np.random.default_rng(0)
        batches = [ImageBatch(
            qs=rng.uniform(0, 1, 4).astype(np.float32),
            imgs_raw=rng.uniform(0, 1, (4, 2, 48, 48, 3)).astype(np.float32),
            indices=np.arange(4), valid=4) for _ in range(2)]

        params, opt_state, step_count, cors = engine.do_training(
            flaky_step, params, opt_state, mask, batches, jax.random.PRNGKey(0),
            (0.75, 1.0, 0.2), writer=None, logger=print, is_pairwise=False,
            is_debug=True, output_dir=str(tmp_path),
            checkpoint_every_n_batches=10 ** 9, epoch=1, step=0)
        assert step_count == 2          # both batches trained
        assert calls["n"] == 3          # 1 fault + 2 successful dispatches
        assert np.isfinite(cors["SROCC"])
