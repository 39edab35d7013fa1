"""Training / evaluation engine: the ``train()`` orchestrator.

Capability parity with the reference's ``train.py`` (train() L652-953,
do_training L483-580, do_validation L583-644, get_model L138-190,
save_checkpoint policy L222-251): the same phase gating (do_train/do_val/
do_test), output-dir naming, freeze-until-epoch schedule, best/latest
checkpoint policy driven by SROCC maxima, loss-weight decay, eval repeats
with prediction averaging, TensorBoard-style scalar logging (including the
reference's per-batch SROCC for batches > 4), and prediction dumps.

TPU-first differences:
- One fused jitted step does sampling -> extraction -> forward -> loss ->
  update (vtamiq_tpu.train.steps); no AMP GradScaler (bf16 needs none,
  SURVEY.md §2.5).
- Freeze/unfreeze swaps a 0/1 gradient-mask pytree — no optimizer rebuild,
  no retrace.
- Optional (data, model, seq) mesh: set global_config["mesh_data" /
  "mesh_model" / "mesh_seq"]. mesh_seq > 1 turns on sequence parallelism —
  attention runs through the ppermute ring (parallel/ring_attention.py).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.checkpoint import (
    save_checkpoint, load_checkpoint, merge_params, apply_pretraining_gates,
    MODEL_STATE_DICT, PREF_MODULE_STATE_DICT,
)
from ..models.configs import VTAMIQConfig
from ..models.preference import init_preference_params
from ..models.vit import load_vit_npz
from ..models.vtamiq import init_vtamiq_params
from ..ops.correlations import (
    compute_correlations_flat,
    SROCC_FIELD, KROCC_FIELD, PLCC_FIELD, RMSE_FIELD,
    PLCC_NOFIT_FIELD, RMSE_NOFIT_FIELD,
)
from ..ops.sampling import PatchSampler
from ..parallel.mesh import make_mesh, shard_params, shard_batch
from ..utils import (
    Logger, FileLogger, log, log_warn, Max, SplitSummaryWriter,
)
from ..utils.retry import retry_transient
from . import config as C
from .optim import make_optimizer, build_freeze_mask
from .steps import ExtractConfig, make_train_step, make_eval_step

CHECKPOINT_EXT = "npz"


# --------------------------------------------------------------------------
# model construction / checkpoint IO
# --------------------------------------------------------------------------

def get_model_params(cfg: VTAMIQConfig, checkpoint_file: Optional[str] = None,
                     force_load_pretrained: bool = False, seed: int = 0,
                     use_pref_module: bool = False,
                     preloaded_ckpt: Optional[Dict] = None) -> Dict:
    """Initialize VTAMIQ params; optionally load ImageNet ViT npz weights and
    a framework checkpoint with pretraining gates (reference get_model,
    train.py:138-190). ``preloaded_ckpt`` skips the file read when the
    caller already holds load_checkpoint()'s result (recovery path reads
    the same ~200 MB npz for the optimizer leaves)."""
    params = init_vtamiq_params(jax.random.PRNGKey(seed), cfg)

    vit_npz = cfg.vit.vit_weights_path
    if (C.pretraining_config["allow_pretrained_vit"] and vit_npz
            and os.path.isfile(vit_npz)):
        log(f"ViT: loading pretrained transformer weights from {vit_npz}")
        params["vit"] = load_vit_npz(np.load(vit_npz), cfg.vit, params["vit"])
    elif vit_npz:
        log_warn(f"ViT weights path [{vit_npz}] not found; using random init.")

    if use_pref_module:
        params["pref_module"] = init_preference_params(**C.pref_module_config)

    if checkpoint_file is not None or preloaded_ckpt is not None:
        ckpt = preloaded_ckpt
        if ckpt is None:
            log(f"Loading checkpoint file '{checkpoint_file}'")
            ckpt = load_checkpoint(checkpoint_file)
        state = ckpt.get(MODEL_STATE_DICT, {})
        if not force_load_pretrained:
            state = apply_pretraining_gates(
                state,
                allow_vit=C.pretraining_config["allow_pretrained_weights_vit"],
                allow_diffnet=C.pretraining_config["allow_pretrained_weights_diffnet"],
                log=log)
        params = merge_params(params, state, strict=False, log=log)
        if use_pref_module and PREF_MODULE_STATE_DICT in ckpt:
            params["pref_module"] = merge_params(
                params["pref_module"], ckpt[PREF_MODULE_STATE_DICT], log=log)
    else:
        log_warn("Model used without framework checkpoint weights.")
    return params


def _save(output_dir: str, filename: str, params: Dict, epoch: int, srocc: float,
          opt_state=None, extra_meta: Optional[Dict] = None):
    if not _is_coordinator():  # multi-host: process 0 owns checkpoints
        return
    models = {MODEL_STATE_DICT: {k: v for k, v in params.items() if k != "pref_module"}}
    if "pref_module" in params:
        models[PREF_MODULE_STATE_DICT] = params["pref_module"]
    save_checkpoint(output_dir, filename, models, epoch, srocc,
                    opt_state=opt_state if C.global_config["save_optimizer"] else None,
                    extra_meta=extra_meta)


# --------------------------------------------------------------------------
# epoch loops
# --------------------------------------------------------------------------

def _full_size_hw(batch, xp):
    """Synthesized per-item true-size array for exact-size batches (every
    item fills the full raw (H, W)); one definition for the single-host
    (jnp) and multi-host (np) batch paths."""
    return xp.tile(xp.asarray(batch.imgs_raw.shape[2:4], xp.int32)[None],
                   (batch.imgs_raw.shape[0], 1))


def _batch_arrays(batch, need_hw: bool = False):
    """Device arrays for one host batch. ``img_hw`` (true sizes for padded
    canonical buckets) is None unless the loader produced it; with
    ``need_hw`` (mesh steps take it positionally) a full-size hw array is
    synthesized for exact-size batches."""
    raw = jnp.asarray(batch.imgs_raw)
    qs = jnp.asarray(batch.qs)
    hw = getattr(batch, "img_hw", None)
    if hw is not None:
        hw = jnp.asarray(hw)
    elif need_hw:
        hw = _full_size_hw(batch, jnp)
    return raw, qs, hw


def _is_coordinator() -> bool:
    """Checkpoints/logs are written by process 0 only (multi-host)."""
    from ..parallel.distributed import is_coordinator
    return is_coordinator()


def _batch_device_arrays(batch, mesh):
    """(raw, qs, hw, valid_for_step) for one step.

    Single-host: local arrays, sharded over the mesh when one is given.
    Multi-host (jax.process_count() > 1, lockstep loader schedule): each
    process contributes its local slice of the GLOBAL batch via
    jax.make_array_from_process_local_data, and the step's validity mask
    uses the GLOBAL valid count (pads are a suffix of the global batch)."""
    nproc = jax.process_count()
    if mesh is not None and nproc > 1 and batch.global_valid is not None:
        from ..parallel import distributed as D
        hw = getattr(batch, "img_hw", None)
        if hw is None:
            hw = _full_size_hw(batch, np)
        g = batch.qs.shape[0] * nproc
        raw, qs, hw = D.global_batch(
            mesh, (np.asarray(batch.imgs_raw, np.float32),
                   np.asarray(batch.qs, np.float32),
                   np.asarray(hw, np.int32)), g)
        return raw, qs, hw, int(batch.global_valid)
    raw, qs, hw = _batch_arrays(batch, need_hw=mesh is not None)
    if mesh is not None:
        raw, qs, hw = shard_batch((raw, qs, hw), mesh)
    return raw, qs, hw, int(batch.valid)


def _collect_predictions(batch, qs_dev, q_p):
    """This batch's (labels, predictions) restricted to REAL items.

    Multi-host: all-gather the (tiny) global label/prediction vectors so
    EVERY process reconstructs the identical global list — epoch
    correlations then agree bit-for-bit across hosts, matching single-host
    semantics."""
    nproc = jax.process_count()
    if nproc > 1 and batch.global_valid is not None:
        from jax.experimental import multihost_utils
        b = batch.qs.shape[0]
        gqs, gqp = multihost_utils.process_allgather((qs_dev, q_p), tiled=True)
        gqs = np.asarray(gqs).reshape(-1)
        gqp = np.asarray(gqp).reshape(-1)
        ys, yps = [], []
        for p in range(nproc):
            vp = int(np.clip(batch.global_valid - p * b, 0, b))
            if vp:
                ys.append(gqs[p * b:p * b + vp])
                yps.append(gqp[p * b:p * b + vp])
        return (np.concatenate(ys).astype(float),
                np.concatenate(yps).astype(float))
    v = batch.valid
    return (np.asarray(batch.qs[:v], float), np.asarray(q_p, float)[:v])


def _buffer_casualty(exc: BaseException, params) -> bool:
    """True when a failed dispatch left the DONATED params/opt_state
    unusable (utils/retry.py caveat): the error names a deleted/donated
    buffer, or a param leaf reports is_deleted()."""
    msg = str(exc).lower()
    if "deleted" in msg or "donated" in msg:
        return True
    for leaf in jax.tree_util.tree_leaves(params):
        if getattr(leaf, "is_deleted", None) and leaf.is_deleted():
            return True
    return False


def do_training(train_step, params, opt_state, mask, loader, key,
                loss_weights, *, writer, logger, is_pairwise, is_debug,
                output_dir, checkpoint_every_n_batches, epoch, step,
                mesh=None, recover_fn=None):
    """One training epoch; returns (params, opt_state, step, correlations)
    (reference do_training, train.py:483-580).

    ``recover_fn``: optional () -> (params, opt_state) | None rebuilding the
    training state from the latest checkpoint — invoked when a transient
    fault lands AFTER buffer donation so the retried dispatch dies on
    deleted buffers (round-2 VERDICT weak #5); the epoch then continues
    from the checkpointed state instead of killing the run."""
    q_vals, qp_vals = [], []
    lw = jnp.asarray(loss_weights, jnp.float32)

    for batch_i, batch in enumerate(loader):
        key, sub = jax.random.split(key)
        raw, qs, hw, valid = _batch_device_arrays(batch, mesh)
        if valid < 2:
            # qs.shape[0] is always batch_size after host padding; the REAL
            # item count is batch.valid (reference skip guard, train.py:546).
            # Multi-host: valid is the GLOBAL count, so all processes skip
            # the same batches (lockstep).
            log_warn("Batch has < 2 valid items; skipping current batch.")
            continue

        def dispatch(p, o):
            step_args = (p, o, mask, raw, qs, jnp.asarray(valid), sub, lw)
            if hw is not None:
                step_args += (hw,)
            return retry_transient(
                train_step, *step_args,
                max_retries=C.global_config.get("device_fault_retries", 2),
                log=log_warn)

        # transient-fault retry (reference's skip-batch resilience analog,
        # train.py:503-510); a fault AFTER donation deletes params/opt_state
        # -> rebuild both from the latest checkpoint and redo this batch
        try:
            params, opt_state, metrics, q_p = dispatch(params, opt_state)
        except Exception as e:  # noqa: BLE001 — classified below
            if recover_fn is None or not _buffer_casualty(e, params):
                raise
            log_warn("Post-donation device fault ("
                     f"{str(e)[:120]}); restoring params/optimizer from the "
                     "latest checkpoint and continuing the epoch.")
            restored = recover_fn()
            if restored is None:
                raise
            params, opt_state = restored
            params, opt_state, metrics, q_p = dispatch(params, opt_state)

        y_b, yp_b = _collect_predictions(batch, qs, q_p)
        q_vals.append(y_b)
        qp_vals.append(yp_b)
        v = len(y_b)

        if not is_debug and writer is not None:
            if is_pairwise:
                writer.add_scalar(C.SPLIT_NAME_TRAIN, "mae_loss",
                                  float(metrics["loss"]), step)
            else:
                writer.add_scalar(C.SPLIT_NAME_TRAIN, "loss", float(metrics["loss"]), step)
                writer.add_scalar(C.SPLIT_NAME_TRAIN, "mae_loss", float(metrics["mae"]), step)
                writer.add_scalar(C.SPLIT_NAME_TRAIN, "rank_loss", float(metrics["rank"]), step)
                writer.add_scalar(C.SPLIT_NAME_TRAIN, "pears_loss", float(metrics["pears"]), step)
            if v > 4:  # correlations need enough points (reference train.py:546)
                cors = compute_correlations_flat([q_vals[-1]], [qp_vals[-1]], warn=None)
                writer.add_scalar(C.SPLIT_NAME_TRAIN, "SROCC_batch_s",
                                  cors[SROCC_FIELD], step)

        if not is_debug and (batch_i + 1) % checkpoint_every_n_batches == 0:
            logger(f"Saving latest model during training: epoch=[{epoch}], "
                   f"batch_i=[{batch_i}]")
            _save(output_dir, f"latest.{CHECKPOINT_EXT}", params, epoch, -1, opt_state)

        step += 1

    correlations = compute_correlations_flat(q_vals, qp_vals, warn=log_warn)
    if not is_debug and writer is not None:
        _writer_log_correlations(writer, C.SPLIT_NAME_TRAIN, correlations, epoch)
    return params, opt_state, step, correlations


def do_validation(eval_step, params, loader, key, loss_weights, *,
                  split_name, writer, logger, is_pairwise, is_debug,
                  num_repeats=1, step=0, epoch=0, output_logger=None, tag="",
                  mesh=None):
    """Validation/test pass with patch-resampling repeats; predictions are
    averaged across repeats (reference do_validation, train.py:583-644)."""
    ys, yps = [], []
    lw = jnp.asarray(loss_weights, jnp.float32)

    for repeat in range(num_repeats):
        for i, batch in enumerate(loader):
            key, sub = jax.random.split(key)
            raw, qs, hw, valid = _batch_device_arrays(batch, mesh)
            step_args = (params, raw, qs, jnp.asarray(valid), sub, lw)
            if hw is not None:
                step_args += (hw,)
            metrics, q_p = retry_transient(
                eval_step, *step_args,
                max_retries=C.global_config.get("device_fault_retries", 2),
                log=log_warn)

            y_b, yp_b = _collect_predictions(batch, qs, q_p)
            ys.append(y_b)
            yps.append(yp_b)

            if writer is not None and not is_debug:
                prefix = f"{tag}-" if tag else ""
                writer.add_scalar(split_name, prefix + "loss", float(metrics["loss"]),
                                  step, force_add=True)
                if not is_pairwise:
                    # component series too (reference writer_log_losses on
                    # val/test batches, train.py:625-629)
                    for name in ("mae", "rank", "pears"):
                        writer.add_scalar(split_name, f"{prefix}{name}_loss",
                                          float(metrics[name]), step,
                                          force_add=True)
            if output_logger is not None:
                output_logger(i, tag, ",".join(str(x) for x in yps[-1]))
            step += 1

    correlations = compute_correlations_flat(ys, yps, num_repeats, warn=log_warn) \
        if ys else None
    if writer is not None and not is_debug and correlations is not None:
        _writer_log_correlations(writer, split_name, correlations, epoch, tag=tag)
    return step, correlations


def _writer_log_correlations(writer, split_name, correlations, step, tag=""):
    prefix = f"{tag}-" if tag else ""
    writer.add_scalar(split_name, prefix + SROCC_FIELD, correlations[SROCC_FIELD],
                      step, force_add=True)
    writer.add_scalar(split_name, prefix + KROCC_FIELD, correlations[KROCC_FIELD],
                      step, force_add=True)
    writer.add_scalar(split_name, prefix + PLCC_FIELD, correlations[PLCC_FIELD],
                      step, force_add=True)
    writer.add_scalar(split_name, prefix + RMSE_FIELD, correlations[RMSE_FIELD],
                      step, force_add=True)


# --------------------------------------------------------------------------
# orchestrator
# --------------------------------------------------------------------------

def train():
    """Full training/eval run driven by the config dicts; returns the test
    correlations dict (reference train(), train.py:652-953)."""
    C.validate_configs()
    g = C.global_config

    is_debug = g["is_debug"]
    is_verbose = g["is_verbose"]
    is_pairwise = C.dataset_is_pairwise(C.dataset_target())
    do_train_ = g["do_train"]
    do_val_ = g["do_val"]
    do_test_ = g["do_test"]
    is_test_only = not do_train_ and not do_val_ and do_test_
    use_pref_module = g["use_pref_module"]

    log(f"Current run with do_train={do_train_}, do_val={do_val_}, do_test={do_test_}.")
    assert not (is_debug and is_test_only), "Debug mode disables saving; can't run test-only."
    assert do_train_ or do_test_, "Run must have at least training or testing stage."
    assert not (not do_train_ and do_val_), "Validation requires training."

    cfg = C.build_model_config()
    checkpoint_file = g["load_checkpoint_file"]

    seed = g["seed"]
    if seed == -1:
        seed = int(time.time()) % (2 ** 31)
        if jax.process_count() > 1:
            # lockstep invariant: every process must use ONE seed (random
            # splits, epoch schedules, and the replicated step RNG all
            # derive from it) — broadcast process 0's clock-resolved value
            from jax.experimental import multihost_utils
            seed = int(multihost_utils.broadcast_one_to_all(
                np.int64(seed)))
    # write the RESOLVED seed back: dataloaders read global_config["seed"]
    # (config.py get_dataloaders) and save_configs records it — without this
    # a seed=-1 run built every loader with seed 0 (identical shuffle/flip
    # order across "random" runs) and dumped an unreproducible -1
    g["seed"] = seed
    np.random.seed(seed)
    key = jax.random.PRNGKey(seed)

    params = get_model_params(cfg, checkpoint_file, seed=seed,
                              use_pref_module=use_pref_module)

    # output dir naming (reference train.py:680-731)
    output_dir = g["output_dir"] + "/{}".format(int(time.time()))
    output_dir += "-" + C.dataset_target() + "-" + g["model"]
    output_dir += "-{}-{}L-{}R".format(cfg.vit.variant, cfg.vit.effective_num_layers,
                                       C.vtamiq_config["num_rcabs"])
    if is_test_only:
        output_dir += "-TESTSET-" + str(C.dataloader_config_base[C.SPLIT_NAME_TEST][C.PATCH_COUNT])
    else:
        output_dir += "-{}e-{}b-{}p".format(
            g["num_epochs"],
            C.dataloader_config_base[C.SPLIT_NAME_TRAIN][C.BATCH_SIZE],
            C.dataloader_config_base[C.SPLIT_NAME_TRAIN][C.PATCH_COUNT])
    if use_pref_module:
        output_dir += "-pref"

    # freeze schedule (reference train.py:707-726)
    allow_freeze = C.freeze_config["freeze_vtamiq"]
    freeze_model = not is_test_only and (
        allow_freeze or
        (C.freeze_config["freeze_conditional"] and
         (checkpoint_file is None or C.dataset_target() not in str(checkpoint_file))))
    freeze_end_after_epochs = C.freeze_config["freeze_end_after_epochs"][C.dataset_target()]
    if freeze_model:
        output_dir += "-frz"
    if g["output_tag"]:
        output_dir += f"-{g['output_tag']}"
    g["output_dir_final"] = output_dir

    save_val_outputs = g["save_val_outputs"] and not is_debug
    save_test_outputs = g["save_test_outputs"] and not is_debug
    output_qs_path = output_dir + "/" + g["save_test_outputs_txt"]
    val_logger = FileLogger(output_qs_path if save_val_outputs else None, verbose=False)
    test_logger = FileLogger(output_qs_path if save_test_outputs else None, verbose=False)

    if is_debug:
        logger_run = Logger(verbose=is_verbose)
        writer = None
    else:
        os.makedirs(output_dir, exist_ok=True)
        logger_run = FileLogger(f"{output_dir}/{g['output_txt']}", verbose=is_verbose)
        writer = SplitSummaryWriter(logdir=output_dir,
                                    log_every_n_steps=g["tensorlog_every_n_steps"])
        logger_run(f"tensorboard --logdir='{output_dir}'")

    if (do_val_ or do_test_) and not do_train_:
        g["num_epochs"] = 1

    # loaders (full-dataset override: reference train.py:769-773)
    train_xor = (do_train_ ^ do_val_ ^ do_test_) and not (do_train_ and do_val_ and do_test_)
    use_full_dataset = train_xor and g["allow_use_full_dataset"]
    loader_train, loader_val, loader_test, _factory = C.get_dataloaders(
        use_full_dataset=use_full_dataset)

    checkpoint_every_n_batches = g["checkpoint_every_n_batches"]
    if checkpoint_every_n_batches <= 0:
        checkpoint_every_n_batches = 999999999999

    # mesh (optional multi-chip)
    mesh = None
    mesh_seq = int(g.get("mesh_seq", 1))
    if g["mesh_data"] * g["mesh_model"] * mesh_seq > 1:
        mesh = make_mesh(data=g["mesh_data"], model=g["mesh_model"],
                         seq=mesh_seq)
        log(f"Using device mesh: data={g['mesh_data']} "
            f"model={g['mesh_model']} seq={mesh_seq}")
    elif jax.process_count() > 1:
        # multi-host (jax.distributed initialized before train()): the global
        # step MUST span every process's devices; default to pure DP
        mesh = make_mesh(data=jax.device_count(), model=1)
        log(f"Multi-host run ({jax.process_count()} processes): auto mesh "
            f"data={jax.device_count()} model=1")

    compute_dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                     "mixed": "mixed"}[g["compute_dtype"]]
    sampler = PatchSampler(**C.dataset_config_base["patch_sampler_config"])

    # model-input normalization is fused into the device step
    _probe_loader = loader_train or loader_val or loader_test
    norm_mean, norm_std = _probe_loader.dataset.get_norm_mean_std()

    def make_ecfg(split):
        return ExtractConfig(
            patch_count=C.dataloader_config_base[split][C.PATCH_COUNT],
            patch_dim=C.dataset_config_base["patch_dim"],
            patch_num_scales=C.dataset_config_base["patch_num_scales"],
            scale_num_samples_ratio=C.dataset_config_base["patch_sampling_num_scales_ratio"],
            use_aligned_patches=bool(
                C.dataloader_config_base[split][C.USE_ALIGNED_PATCHES]),
            randomize_patch_scale_order=bool(
                C.dataset_config_base.get("randomize_patch_scale_order", False)),
            norm_mean=tuple(norm_mean) if norm_mean is not None else None,
            norm_std=tuple(norm_std) if norm_std is not None else None,
            # an fp32 run must not quietly round its model inputs to bf16
            # in the fused gather (ExtractConfig default); "mixed" gathers
            # bf16 — the patches' first consumer is the bf16 patch-embed
            # matmul, and pixels are 8-bit-sourced anyway
            gather_dtype=("float32" if compute_dtype == jnp.float32
                          else "bfloat16"),
            pu_display_encode=bool(g["use_pu"]))

    steps_per_epoch = len(loader_train) if loader_train is not None else 1
    optimizer, lr_schedule = make_optimizer(g, steps_per_epoch)
    opt_state = optimizer.init(params)

    # full resume: params + optimizer state + epoch (preemption recovery;
    # requires a checkpoint written with save_optimizer=True)
    start_epoch = 1
    resume_meta: Dict = {}
    resume_file = g.get("resume_checkpoint_file")
    if resume_file:
        from ..models.checkpoint import restore_opt_state
        log(f"Resuming from checkpoint '{resume_file}'")
        ckpt = load_checkpoint(resume_file)
        params = merge_params(params, ckpt.get(MODEL_STATE_DICT, {}), log=log)
        if use_pref_module and PREF_MODULE_STATE_DICT in ckpt:
            params["pref_module"] = merge_params(
                params["pref_module"], ckpt[PREF_MODULE_STATE_DICT], log=log)
        if "__opt_leaves__" in ckpt:
            # opt_state (initialized just above) is the structure template —
            # merge preserves leaf shapes, so no second optimizer.init
            opt_state = restore_opt_state(opt_state, ckpt["__opt_leaves__"])
            log("Optimizer state restored.")
        else:
            log_warn("Resume checkpoint has no optimizer state; "
                     "fresh optimizer (schedule restarts).")
        start_epoch = int(ckpt.get("epoch", 0)) + 1
        resume_meta = ckpt.get("meta", {})
        log(f"Resuming at epoch {start_epoch}.")

    train_step = eval_step_val = eval_step_test = None
    if do_train_:
        train_step = make_train_step(
            cfg, sampler, make_ecfg(C.SPLIT_NAME_TRAIN), optimizer,
            is_pairwise=is_pairwise, use_pref_module=use_pref_module,
            weighted_loss=g["use_weighted_loss"], compute_dtype=compute_dtype,
            mesh=mesh)
        if mesh is not None:
            mask_t = build_freeze_mask(params, False, None)
            train_step = train_step(params, opt_state, mask_t)
    if do_val_:
        eval_step_val = make_eval_step(
            cfg, sampler, make_ecfg(C.SPLIT_NAME_VAL), is_pairwise=is_pairwise,
            use_pref_module=use_pref_module, weighted_loss=g["use_weighted_loss"],
            compute_dtype=compute_dtype, mesh=mesh)
        if mesh is not None:
            eval_step_val = eval_step_val(params)
    if do_test_:
        eval_step_test = make_eval_step(
            cfg, sampler, make_ecfg(C.SPLIT_NAME_TEST), is_pairwise=is_pairwise,
            use_pref_module=use_pref_module, weighted_loss=g["use_weighted_loss"],
            compute_dtype=compute_dtype, mesh=mesh)
        if mesh is not None:
            eval_step_test = eval_step_test(params)

    # freeze state
    frozen_model = False
    mask = build_freeze_mask(params, False, None)
    if freeze_model:
        logger_run("Model freezing params...")
        frozen_model = True
        mask = build_freeze_mask(params, True, C.freeze_dict_vtamiq)

    if mesh is not None:
        params = shard_params(params, mesh)

    # model info: param table / FLOPs (reference train.py:786-789)
    from ..models.utils import print_parameters, print_flops, save_model_params
    log(f"Model {g['model']} info:")
    if g["print_flops"]:
        print_flops(cfg, C.dataloader_config_base[C.SPLIT_NAME_TRAIN][C.PATCH_COUNT],
                    log=log)
    print_parameters(params, full=g["print_params"] or is_debug, log=log)
    if not is_debug:
        save_model_params(params, output_dir)

    logger_run("Configuration completed.")

    w_mae = g["weight_mae_loss"]
    w_rank = g["weight_rank_loss"]
    w_pears = g["weight_pears_loss"]

    def recover_from_latest():
        """Rebuild (params, opt_state) from latest.npz after a post-donation
        fault (see do_training); None when no checkpoint exists yet.

        Multi-host: latest.npz exists on the COORDINATOR only (_save gates
        on process 0), so process 0 loads and broadcasts both pytrees; the
        have-checkpoint / have-optimizer decisions are broadcast first so
        every process takes the same branch (a split decision would
        deadlock the collectives)."""
        from ..models.checkpoint import restore_opt_state
        path = os.path.join(output_dir, f"latest.{CHECKPOINT_EXT}")
        nproc = jax.process_count()
        if nproc <= 1:
            if is_debug or not os.path.isfile(path):
                return None
            ckpt = load_checkpoint(path)
            p = get_model_params(cfg, path, force_load_pretrained=True,
                                 seed=seed, use_pref_module=use_pref_module,
                                 preloaded_ckpt=ckpt)
            o = optimizer.init(p)
            if "__opt_leaves__" in ckpt:
                o = restore_opt_state(o, ckpt["__opt_leaves__"])
            else:
                log_warn("Recovery checkpoint has no optimizer state; "
                         "optimizer restarts from init.")
            if mesh is not None:
                p = shard_params(p, mesh)
            return p, o

        from jax.experimental import multihost_utils
        ckpt = None
        if _is_coordinator() and not is_debug and os.path.isfile(path):
            ckpt = load_checkpoint(path)
        flags = multihost_utils.broadcast_one_to_all(np.asarray(
            [1 if ckpt is not None else 0,
             1 if (ckpt is not None and "__opt_leaves__" in ckpt) else 0],
            np.int32))
        if not int(flags[0]):
            return None
        p = get_model_params(cfg, path if ckpt is not None else None,
                             force_load_pretrained=True, seed=seed,
                             use_pref_module=use_pref_module,
                             preloaded_ckpt=ckpt)  # non-coord: shape template
        host_p = jax.tree_util.tree_map(np.asarray, p)
        host_p = multihost_utils.broadcast_one_to_all(host_p)
        p = jax.tree_util.tree_map(jnp.asarray, host_p)
        o = optimizer.init(p)
        if int(flags[1]):
            leaves = ([np.asarray(x) for x in ckpt["__opt_leaves__"]]
                      if ckpt is not None else
                      [np.asarray(x) for x in jax.tree_util.tree_leaves(o)])
            leaves = list(multihost_utils.broadcast_one_to_all(leaves))
            o = restore_opt_state(o, leaves)
        else:
            log_warn("Recovery checkpoint has no optimizer state; optimizer "
                     "restarts from init.")
        if mesh is not None:
            p = shard_params(p, mesh)
        return p, o

    best_spearman_train = Max()
    best_spearman_val = Max()
    best_spearman = -1.0

    correlations = None
    global_step_train = 0
    global_step_val = 0

    if resume_file and resume_meta:
        # restore the RUN state, not just params+opt: otherwise the first
        # post-resume epochs always overwrite best.npz even when worse than
        # the pre-preemption best, decayed loss weights restart undecayed,
        # and TB step counters overlap the pre-preemption series
        if "best_srocc_train" in resume_meta:
            best_spearman_train.add(float(resume_meta["best_srocc_train"]))
        if "best_srocc_val" in resume_meta:
            best_spearman_val.add(float(resume_meta["best_srocc_val"]))
        best_spearman = float(resume_meta.get("best_srocc", best_spearman))
        # the meta snapshots the weights the SAVED epoch trained with
        # (checkpoints are written before the end-of-epoch decay,
        # reference train.py:899-901); the run resumes at epoch+1, so
        # apply the one decay the preempted run never reached
        if "w_mae" in resume_meta:
            w_mae = float(resume_meta["w_mae"]) * g["weight_mae_loss_decay"]
        if "w_rank" in resume_meta:
            w_rank = float(resume_meta["w_rank"]) * g["weight_rank_loss_decay"]
        if "w_pears" in resume_meta:
            w_pears = (float(resume_meta["w_pears"])
                       * g["weight_pears_loss_decay"])
        global_step_train = int(resume_meta.get("global_step_train", 0))
        global_step_val = int(resume_meta.get("global_step_val", 0))
        log("Run state restored from checkpoint meta (best SROCC trackers, "
            "loss-weight decay, TB step counters).")

    def run_meta():
        """Run-state snapshot stored in every checkpoint's meta (consumed by
        the resume path above; plain JSON-safe scalars)."""
        meta = {"w_mae": w_mae, "w_rank": w_rank, "w_pears": w_pears,
                "global_step_train": global_step_train,
                "global_step_val": global_step_val,
                "best_srocc": best_spearman}
        if best_spearman_train.value() is not None:
            meta["best_srocc_train"] = best_spearman_train.value()
        if best_spearman_val.value() is not None:
            meta["best_srocc_val"] = best_spearman_val.value()
        return meta

    if not is_debug:
        C.save_configs(output_dir)
        C.save_code(output_dir)

    for epoch in range(start_epoch, g["num_epochs"] + 1):
        logger_run("Beginning epoch {:03d}".format(epoch))

        if frozen_model and freeze_end_after_epochs < epoch:
            logger_run("VTAMIQ: Unfreezing params...")
            mask = build_freeze_mask(params, False, None)
            frozen_model = False

        is_best_so_far = False

        if do_train_:
            log("Starting Training loop...")
            key, sub = jax.random.split(key)
            params, opt_state, global_step_train, correlations = do_training(
                train_step, params, opt_state, mask, loader_train, sub,
                (w_mae, w_rank, w_pears), writer=writer, logger=logger_run,
                is_pairwise=is_pairwise, is_debug=is_debug,
                output_dir=output_dir,
                checkpoint_every_n_batches=checkpoint_every_n_batches,
                epoch=epoch, step=global_step_train, mesh=mesh,
                recover_fn=recover_from_latest)

            if not is_debug and writer is not None:
                # per-epoch LR scalar (reference train.py:570-572,
                # get_last_lr BEFORE the epoch-end scheduler.step): log the
                # LR the optimizer actually used this epoch — optax's
                # scale_by_schedule consumes pre-increment counts, so that
                # is schedule(last_update_index), not schedule(next_count)
                lr_log_step = (global_step_train
                               if g["scheduler_step_per_batch"]
                               else max(0, global_step_train - 1))
                writer.add_scalar(C.SPLIT_NAME_TRAIN, "LR",
                                  float(lr_schedule(lr_log_step)), epoch,
                                  force_add=True)

            is_best_so_far = best_spearman_train.add(correlations[SROCC_FIELD])
            if is_best_so_far:
                best_spearman = best_spearman_train.value()
                logger_run(f"Best training SROCC {correlations[SROCC_FIELD]}!")
            else:
                logger_run(f"Current training SROCC {correlations[SROCC_FIELD]} "
                           f"(best={best_spearman_train.value()}).")
            if not is_debug and g["train_save_latest"]:
                logger_run(f"Saving latest model: epoch=[{epoch}], "
                           f"SROCC=[{correlations[SROCC_FIELD]}]")
                _save(output_dir, f"latest.{CHECKPOINT_EXT}", params, epoch,
                      correlations[SROCC_FIELD], opt_state,
                      extra_meta=run_meta())

        if do_val_:
            log("Starting Validation loop...")
            key, sub = jax.random.split(key)
            global_step_val, correlations = do_validation(
                eval_step_val, params, loader_val, sub, (w_mae, w_rank, w_pears),
                split_name=C.SPLIT_NAME_VAL, writer=writer, logger=logger_run,
                is_pairwise=is_pairwise, is_debug=is_debug,
                num_repeats=g["num_repeats_val"], step=global_step_val,
                epoch=epoch, output_logger=val_logger, tag="val", mesh=mesh)

            is_best_so_far = best_spearman_val.add(correlations[SROCC_FIELD])
            if is_best_so_far:
                best_spearman = best_spearman_val.value()
                logger_run(f"Best validation SROCC {correlations[SROCC_FIELD]}!")
            else:
                logger_run(f"Current validation SROCC {correlations[SROCC_FIELD]} "
                           f"(best={best_spearman_val.value()}).")

        if not is_test_only:
            logger_run(f"Completed epoch {epoch}")
            if is_best_so_far:
                logger_run(f"Best SROCC {best_spearman}!")
                if not is_debug:
                    logger_run(f"Saving best model: epoch=[{epoch}], SROCC=[{best_spearman}]")
                    _save(output_dir, f"best.{CHECKPOINT_EXT}", params, epoch,
                          best_spearman, opt_state, extra_meta=run_meta())
            elif correlations is not None:
                logger_run(f"Current SROCC {correlations[SROCC_FIELD]}.")

        # loss-weight decay (reference train.py:899-901)
        w_mae *= g["weight_mae_loss_decay"]
        w_rank *= g["weight_rank_loss_decay"]
        w_pears *= g["weight_pears_loss_decay"]

    if do_test_:
        log("Doing Test.")
        if do_train_ and not is_debug:
            # the reference reloads ONLY the model for testing; the
            # preference module keeps its final-epoch in-memory state
            # (train.py:916-921 rebuilds `model` alone) — preserve that
            pref_keep = (jax.tree_util.tree_map(np.asarray,
                                                params["pref_module"])
                         if use_pref_module and "pref_module" in params
                         else None)
            saved = "{}/{}.{}".format(
                output_dir,
                "latest" if (g["test_use_latest"] and g["train_save_latest"]) else "best",
                CHECKPOINT_EXT)
            if jax.process_count() > 1:
                # the checkpoint exists on the coordinator only (_save gates
                # on process 0, and output_dir embeds per-process state):
                # process 0 loads it and broadcasts the pytree
                from jax.experimental import multihost_utils
                if _is_coordinator():
                    loaded = get_model_params(
                        cfg, saved, force_load_pretrained=True, seed=seed,
                        use_pref_module=use_pref_module)
                    host_tree = jax.tree_util.tree_map(np.asarray, loaded)
                else:  # structure/shape template; values come from proc 0
                    host_tree = jax.tree_util.tree_map(
                        lambda x: np.zeros(x.shape, x.dtype), params)
                params = multihost_utils.broadcast_one_to_all(host_tree)
            else:
                params = get_model_params(cfg, saved, force_load_pretrained=True,
                                          seed=seed, use_pref_module=use_pref_module)
            if pref_keep is not None:
                params["pref_module"] = jax.tree_util.tree_map(jnp.asarray,
                                                               pref_keep)
            if mesh is not None:
                params = shard_params(params, mesh)

        key, sub = jax.random.split(key)
        _, correlations = do_validation(
            eval_step_test, params, loader_test, sub, (w_mae, w_rank, w_pears),
            split_name=C.SPLIT_NAME_TEST, writer=writer, logger=logger_run,
            is_pairwise=is_pairwise, is_debug=is_debug,
            num_repeats=g["num_repeats_test"], output_logger=test_logger,
            tag="test", mesh=mesh)

        if correlations is not None:
            logger_run(
                "Test stats:\n" +
                "".join(f"{f}={correlations[f]}\n" for f in (
                    SROCC_FIELD, KROCC_FIELD, PLCC_FIELD, RMSE_FIELD,
                    PLCC_NOFIT_FIELD, RMSE_NOFIT_FIELD)))

    if not is_debug and writer is not None:
        writer.close()

    return correlations
