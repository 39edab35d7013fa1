"""Jitted train / eval steps: on-device sampling -> extraction -> dual-tower
forward -> loss -> masked optimizer update, as ONE XLA program.

This is the TPU-first replacement for the reference's split between CPU
DataLoader workers (sampling+gather, patch_sampling.py:450-613) and the GPU
forward/backward (train.py:483-580): here the sampler, gather, ViT, DiffNet,
loss, and optimizer fuse into a single compiled step, so HBM traffic is
minimized and there is no host<->device patch shuttling — images ship to the
device once per batch.

Data-parallel + tensor-parallel execution: pass a Mesh and the step is
compiled with GSPMD shardings (batch over "data", Megatron-style TP over
"model"); XLA inserts gradient psums over ICI automatically.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.configs import VTAMIQConfig
from ..models.vtamiq import vtamiq_forward
from ..models.preference import preference_forward, preference_sigmoid
from ..ops.attention import make_attention_fn, FLASH_ATTENTION_THRESHOLD
from ..ops.extraction import get_iqa_patches
from ..ops.losses import loss_func_iqa, loss_func_pairwise
from ..ops.sampling import PatchSampler, DEFAULT_NUM_SAMPLES_RATIO
from ..parallel.mesh import (batch_sharding, param_shardings, replicated,
                             seq_size, Mesh)
from .optim import apply_mask


def _mesh_attention_fn(mesh: Optional[Mesh], ecfg: ExtractConfig):
    """Attention implementation for a step: ring attention when the mesh has
    a sequence-parallel axis (>1), else the Pallas flash kernel past the
    long-sequence threshold, else None (plain fused XLA attention).

    Ring + flash compose: each ring rank holds S/seq tokens and, on TPU,
    runs the Pallas flash kernels per arriving K/V chunk (ring-flash,
    parallel/ring_attention.py) when the local shard has a 128-aligned
    block divisor; smaller shards use the einsum chunk body with the same
    online-softmax merge."""
    if seq_size(mesh) > 1:
        from ..parallel.ring_attention import make_ring_attention_fn
        return make_ring_attention_fn(mesh)
    if ecfg.patch_count >= FLASH_ATTENTION_THRESHOLD:
        return make_attention_fn()
    return None


@dataclasses.dataclass(frozen=True)
class ExtractConfig:
    """Static knobs of the on-device sampling+extraction stage.

    norm_mean/norm_std: model-input normalization, fused into the device
    step so the host ships ONE raw image tensor per batch (the reference
    normalizes on the host and ships normalized copies). None disables
    normalization (HDR / PU modes).
    """
    patch_count: int = 384
    patch_dim: int = 16
    patch_num_scales: int = 1
    scale_num_samples_ratio: float = DEFAULT_NUM_SAMPLES_RATIO
    use_aligned_patches: bool = True
    randomize_patch_scale_order: bool = False  # shuffle the final patch
    # sequence across scales (reference patch_sampling.py:505-508)
    norm_mean: Optional[Tuple[float, float, float]] = (0.5, 0.5, 0.5)
    norm_std: Optional[Tuple[float, float, float]] = (0.5, 0.5, 0.5)
    gather_dtype: str = "bfloat16"  # dtype of the normalized image fed to the
    # patch gather: bf16 halves the gather's HBM traffic; the ViT computes in
    # bf16 anyway (raw images stay fp32 for the diff/sampling map)
    pu_display_encode: bool = False  # use_pu mode: sRGB -> SDR display model
    # -> PU21 perceptually-uniform encoding, fused on device (normalization
    # must be disabled; reference train_config.py:823-826)
    pu_peak_luminance: float = 100.0


def make_extract_fn(sampler: PatchSampler, ecfg: ExtractConfig) -> Callable:
    """(B, K, H, W, 3) raw images + key -> batched patches.

    Normalization is fused on device; vmapped over the batch with per-item
    PRNG keys so every item draws an independent patch layout (like
    per-worker numpy RNG in the reference)."""

    gather_dtype = jnp.dtype(ecfg.gather_dtype)
    if ecfg.pu_display_encode:
        from ..utils.color_spaces import pu21_encode_jnp, srgb_to_linear_jnp

        def normalize(raw):
            # per-channel sRGB->linear, SDR display model, PU21, rescaled to
            # ~[0,1] — matches the host-side pu_encode_srgb reference
            # (utils/color_spaces.py:142-152). PU is nonlinear, so it cannot
            # fuse into the per-tile gather normalize; the encoded image is
            # materialized like the reference's host-side copy.
            lin = srgb_to_linear_jnp(raw)
            lum = (ecfg.pu_peak_luminance - 0.5) * lin + 0.5
            pu = pu21_encode_jnp(lum)
            peak = pu21_encode_jnp(jnp.asarray(ecfg.pu_peak_luminance))
            return (pu / peak).astype(gather_dtype)
        tile_norm = None
    else:
        # affine normalization fuses into the gather tile store (and it
        # commutes with the pyramid's mean-pool), so the normalized image
        # is never materialized; ``tensors`` stays the raw fp32 pixels
        normalize = lambda raw: raw
        tile_norm = (ecfg.norm_mean, ecfg.norm_std, gather_dtype)

    def extract_one(raw, key, hw=None):
        return get_iqa_patches(
            raw, normalize(raw), key, ecfg.patch_count, ecfg.patch_dim, sampler,
            ecfg.patch_num_scales, ecfg.scale_num_samples_ratio,
            ecfg.use_aligned_patches, ecfg.randomize_patch_scale_order,
            img_hw=hw, tile_norm=tile_norm)

    def extract(imgs_raw, key, img_hw=None):
        """img_hw: optional (B, 2) int32 TRUE sizes for padded-bucket batches
        (variable-size datasets); None = images fill their arrays."""
        b = imgs_raw.shape[0]
        keys = jax.random.split(key, b)
        if img_hw is None:
            return jax.vmap(extract_one)(imgs_raw, keys)
        return jax.vmap(extract_one)(imgs_raw, keys, img_hw)

    return extract


def _forward_scores(params, cfg: VTAMIQConfig, patches, pos, scales,
                    is_pairwise: bool, use_pref_module: bool,
                    train: bool, rng, compute_dtype, attention_fn=None):
    """(B, K, N, ...) patches -> predictions.

    FR (K=2): q scores. Pairwise (K=3: ref, distA, distB): preference probs —
    both (ref, distA) and (ref, distB) fold into one forward of batch 2B
    (reference runs two separate passes, train.py:282-301)."""
    if not is_pairwise:
        q = vtamiq_forward(params, cfg, patches, pos, scales, train=train,
                           rng=rng, compute_dtype=compute_dtype,
                           attention_fn=attention_fn)
        return q

    ref_p, d1_p, d2_p = patches[:, 0], patches[:, 1], patches[:, 2]
    pair_patches = jnp.concatenate([
        jnp.stack([ref_p, d1_p], axis=1), jnp.stack([ref_p, d2_p], axis=1)], axis=0)
    ref_u, d1_u, d2_u = pos[:, 0], pos[:, 1], pos[:, 2]
    pair_pos = jnp.concatenate([
        jnp.stack([ref_u, d1_u], axis=1), jnp.stack([ref_u, d2_u], axis=1)], axis=0)
    pair_scales = None
    if scales is not None:
        r, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
        pair_scales = jnp.concatenate([
            jnp.stack([r, s1], axis=1), jnp.stack([r, s2], axis=1)], axis=0)

    q_all = vtamiq_forward(params, cfg, pair_patches, pair_pos, pair_scales,
                           train=train, rng=rng, compute_dtype=compute_dtype,
                           attention_fn=attention_fn)
    b = patches.shape[0]
    q1, q2 = q_all[:b], q_all[b:]
    if use_pref_module:
        return preference_forward(params["pref_module"], q1, q2)
    return preference_sigmoid(q1, q2)


def make_train_step(cfg: VTAMIQConfig, sampler: PatchSampler, ecfg: ExtractConfig,
                    optimizer: optax.GradientTransformation,
                    is_pairwise: bool = False, use_pref_module: bool = False,
                    weighted_loss: bool = False, compute_dtype=jnp.bfloat16,
                    mesh: Optional[Mesh] = None) -> Callable:
    """Build the fused jitted train step.

    step(params, opt_state, mask, imgs_raw, qs, valid, key, loss_weights)
      -> (params, opt_state, metrics dict, q_pred)

    ``mask`` is the 0/1 freeze mask (data, not static — unfreeze never
    retraces). ``valid`` is the traced count of real items in the batch:
    the host pipeline pads partial batches by repeating the last item, and
    padded items are masked out of every loss term (the reference never pads;
    its final torch batch is simply smaller). ``loss_weights`` =
    (w_mae, w_rank, w_pears) traced scalars. Long patch sequences
    automatically use the Pallas flash-attention kernel.
    """
    extract = make_extract_fn(sampler, ecfg)
    attention_fn = _mesh_attention_fn(mesh, ecfg)

    def step(params, opt_state, mask, imgs_raw, qs, valid, key, loss_weights,
             img_hw=None):
        key_sample, key_model = jax.random.split(key)
        patches, pos, scales = extract(imgs_raw, key_sample, img_hw)

        def loss_fn(p):
            q_p = _forward_scores(p, cfg, patches, pos, scales, is_pairwise,
                                  use_pref_module, True, key_model, compute_dtype,
                                  attention_fn)
            if is_pairwise:
                loss = loss_func_pairwise(q_p, qs, valid)
                aux = {"mae": loss, "rank": jnp.zeros(()), "pears": jnp.zeros(())}
            else:
                loss, aux = loss_func_iqa(q_p, qs, loss_weights[0], loss_weights[1],
                                          loss_weights[2], weighted=weighted_loss,
                                          valid=valid)
            return loss, (aux, q_p)

        (loss, (aux, q_p)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        grads = apply_mask(grads, mask)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        updates = apply_mask(updates, mask)
        new_params = optax.apply_updates(params, updates)

        metrics = {"loss": loss, **aux,
                   "grad_norm": optax.global_norm(grads)}
        return new_params, new_opt_state, metrics, q_p

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    # GSPMD-sharded compile: params/opt_state follow TP layout, batch over data
    rep = replicated(mesh)
    data = batch_sharding(mesh)

    def wrap(params_template, opt_state_template, mask_template):
        p_sh = param_shardings(params_template, mesh)
        o_sh = jax.tree_util.tree_map(
            lambda _: rep, opt_state_template,
            is_leaf=lambda x: not isinstance(x, (tuple, list, dict)))
        m_sh = jax.tree_util.tree_map(lambda _: rep, mask_template)
        # the sharded step takes img_hw positionally (always; callers pass
        # full-size hw for fixed-size data) so in_shardings stays positional
        def step9(params, opt_state, mask, imgs_raw, qs, valid, key,
                  loss_weights, img_hw):
            return step(params, opt_state, mask, imgs_raw, qs, valid, key,
                        loss_weights, img_hw)
        return jax.jit(
            step9,
            in_shardings=(p_sh, o_sh, m_sh, data, data, rep, rep, rep, data),
            out_shardings=(p_sh, o_sh, rep, data),
            donate_argnums=(0, 1),
        )

    return wrap


def make_eval_step(cfg: VTAMIQConfig, sampler: PatchSampler, ecfg: ExtractConfig,
                   is_pairwise: bool = False, use_pref_module: bool = False,
                   weighted_loss: bool = False, compute_dtype=jnp.bfloat16,
                   mesh: Optional[Mesh] = None) -> Callable:
    """eval_step(params, imgs_raw, qs, valid, key, loss_weights)
    -> (metrics, q_pred). No dropout/droppath; patches re-sampled per call
    (eval repeats average predictions downstream, train.py:398-409).
    ``valid`` masks host-padded items out of the logged losses."""
    extract = make_extract_fn(sampler, ecfg)
    attention_fn = _mesh_attention_fn(mesh, ecfg)

    def step(params, imgs_raw, qs, valid, key, loss_weights, img_hw=None):
        patches, pos, scales = extract(imgs_raw, key, img_hw)
        q_p = _forward_scores(params, cfg, patches, pos, scales, is_pairwise,
                              use_pref_module, False, None, compute_dtype,
                              attention_fn)
        if is_pairwise:
            loss = loss_func_pairwise(q_p, qs, valid)
            aux = {"mae": loss, "rank": jnp.zeros(()), "pears": jnp.zeros(())}
        else:
            loss, aux = loss_func_iqa(q_p, qs, loss_weights[0], loss_weights[1],
                                      loss_weights[2], weighted=weighted_loss,
                                      valid=valid)
        return {"loss": loss, **aux}, q_p

    if mesh is None:
        return jax.jit(step)

    rep = replicated(mesh)
    data = batch_sharding(mesh)

    def wrap(params_template):
        p_sh = param_shardings(params_template, mesh)

        def step7(params, imgs_raw, qs, valid, key, loss_weights, img_hw):
            return step(params, imgs_raw, qs, valid, key, loss_weights, img_hw)
        return jax.jit(step7,
                       in_shardings=(p_sh, data, data, rep, rep, rep, data),
                       out_shardings=(rep, data))
    return wrap
