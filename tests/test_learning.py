"""Learning-signal sanity: the full pipeline learns a synthetic quality
ordering (graded noise levels) — train SROCC must climb well above chance.

This is the toy-scale stand-in for the reference's statistical acceptance
testing (SURVEY.md §4: quality "tested" via SROCC on held-out splits)."""

import numpy as np
import jax
import jax.numpy as jnp

from vtamiq_tpu.models.configs import get_vit_config, VTAMIQConfig
from vtamiq_tpu.models.vtamiq import init_vtamiq_params
from vtamiq_tpu.ops import PatchSampler, compute_correlations, SROCC_FIELD
from vtamiq_tpu.train.optim import make_optimizer, build_freeze_mask
from vtamiq_tpu.train.steps import ExtractConfig, make_train_step, make_eval_step

CFG = VTAMIQConfig(vit=get_vit_config(num_keep_layers=2, num_extra_tokens=2,
                                      hidden_size=32, mlp_dim=64, num_heads=2),
                   num_rgs=1, num_rcabs=1, ca_reduction=4,
                   rg_path_drop=0.0, predictor_dropout=0.0)

GCONF = dict(optimizer="AdamW", optimizer_weight_decay=0.0,
             optimizer_learning_rate=3e-3, scheduler_step_per_batch=False,
             scheduler_type="lambda", optimizer_learning_rate_decay_lambda_goal=1.0,
             num_epochs=1, optimizer_decay_after_n_epochs=[99],
             optimizer_sgd_momentum=0.9, optimizer_sgd_nesterov=True)


def make_graded_batch(rng, b=8, h=48, w=48):
    """ref + noise of graded sigma; q = normalized sigma rank (0 = pristine)."""
    levels = rng.uniform(0.0, 0.5, size=b).astype(np.float32)
    raw = np.empty((b, 2, h, w, 3), np.float32)
    for i, sigma in enumerate(levels):
        ref = rng.uniform(0.2, 0.8, size=(h, w, 3)).astype(np.float32)
        dist = np.clip(ref + rng.normal(0, sigma, ref.shape), 0, 1).astype(np.float32)
        raw[i, 0] = ref
        raw[i, 1] = dist
    qs = levels / 0.5
    return jnp.asarray(raw), jnp.asarray(qs)


def test_pipeline_learns_noise_ordering():
    params = init_vtamiq_params(jax.random.PRNGKey(0), CFG)
    optimizer, _ = make_optimizer(GCONF, steps_per_epoch=1)
    opt_state = optimizer.init(params)
    mask = build_freeze_mask(params, False, None)
    ecfg = ExtractConfig(patch_count=32, patch_dim=16)
    step = make_train_step(CFG, PatchSampler(), ecfg, optimizer,
                           compute_dtype=jnp.float32)
    eval_step = make_eval_step(CFG, PatchSampler(), ecfg, compute_dtype=jnp.float32)
    lw = jnp.array([0.75, 1.0, 0.2])

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # pre-training eval on a held-out graded batch
    raw_ev, qs_ev = make_graded_batch(rng, b=16)
    _, qp0 = eval_step(params, raw_ev, qs_ev, jnp.asarray(16), jax.random.PRNGKey(99), lw)
    srocc_before = compute_correlations(
        np.asarray(qs_ev), np.asarray(qp0))[SROCC_FIELD]

    for i in range(80):
        raw, qs = make_graded_batch(rng)
        key, sub = jax.random.split(key)
        params, opt_state, metrics, _ = step(params, opt_state, mask,
                                             raw, qs, jnp.asarray(8), sub, lw)

    _, qp1 = eval_step(params, raw_ev, qs_ev, jnp.asarray(16), jax.random.PRNGKey(99), lw)
    srocc_after = compute_correlations(
        np.asarray(qs_ev), np.asarray(qp1))[SROCC_FIELD]

    # noise magnitude is an easy signal: tiny model should exceed 0.7
    assert srocc_after > 0.7, (srocc_before, srocc_after)
    assert srocc_after > srocc_before - 0.05
