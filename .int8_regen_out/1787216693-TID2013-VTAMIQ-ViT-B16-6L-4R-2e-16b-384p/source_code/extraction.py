"""Patch extraction: fused gather + multiscale pyramid, jittable end-to-end.

Capability parity with the reference's ``get_iqa_patches``
(data/patch_sampling.py:450-613), redesigned TPU-first:

- Channels-last layout (K, H, W, 3) throughout (TPU-native), patches come out
  as (K, N, P, P, 3) so the ViT patch embedding is a single
  ``(K*N, P*P*3) @ (P*P*3, H)`` matmul on the MXU.
- The per-scale numpy fancy-index gather (reference L529-545) is a single XLA
  gather; the 2x AvgPool downsample chain (reference L552,599-603) is
  ``lax.reduce_window`` with mean.
- The scale loop is unrolled at trace time (scale counts are static); outputs
  have static shapes (N total patches regardless of scale split).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sampling import (
    PatchSampler,
    compute_num_patches_per_scale,
    compute_patch_num_scales,
    DEFAULT_NUM_SAMPLES_RATIO,
)
from .gather_kernel import pallas_gather_patches, vmem_gather_supported


def gather_patches(img: jnp.ndarray, topleft: jnp.ndarray, patch_dim: int,
                   tile_norm: Optional[tuple] = None) -> jnp.ndarray:
    """Gather square pixel blocks.

    img: (H, W, C); topleft: (2, N) float/int top-left coords ->
    (N, P, P, C). Float coordinates are floored (the reference's integer
    meshgrid indexing, patch_sampling.py:539-545).

    ``tile_norm``: optional (mean(C,), std(C,), out_dtype) STATIC spec; the
    model-input normalization is applied per gathered tile ((x-mean)/std,
    cast to out_dtype) instead of over the full image — fused for free into
    the Pallas kernel's tile store; the full normalized image is never
    materialized (+4% fused pipeline on v5e, docs/OPERATIONS.md;
    reproduce with `tools/profiler.py stages`).

    On TPU, for images within the VMEM budget, this is a Pallas VMEM-
    resident kernel with no per-patch HBM DMA descriptors (gather_kernel.py)
    — the vmapped dynamic_slice below (one XLA gather, descriptor-rate
    bound: 1.207 ms/pair at 500x16x16, batch 16x2) is the fallback for CPU
    tests and oversized images. (Isolated single-image microbenchmarks rank
    gather strategies the OPPOSITE way of in-context runs — they measure
    serial dispatch latency, not batched throughput; trust only in-context
    runs — `tools/profiler.py extract` / docs/OPERATIONS.md.)
    """
    h, w = img.shape[0], img.shape[1]
    c = img.shape[2]
    ti = jnp.clip(jnp.floor(topleft[0]).astype(jnp.int32), 0, h - patch_dim)
    tj = jnp.clip(jnp.floor(topleft[1]).astype(jnp.int32), 0, w - patch_dim)
    mean, std, out_dtype = tile_norm if tile_norm is not None else (None, None, None)

    if jax.default_backend() != "cpu" and vmem_gather_supported(
            img.shape, img.dtype, patch_dim,
            num_patches=int(ti.shape[0]),
            out_dtype=out_dtype if out_dtype is not None else img.dtype):
        return pallas_gather_patches(img, ti, tj, patch_dim,
                                     norm_mean=mean, norm_std=std,
                                     out_dtype=out_dtype)

    def slice_one(i, j):
        return jax.lax.dynamic_slice(img, (i, j, 0), (patch_dim, patch_dim, c))

    out = jax.vmap(slice_one)(ti, tj)
    if tile_norm is not None:
        if mean is not None:
            # (x - mean) * (1/std): the SAME formula as the Pallas kernel's
            # fused store (gather_kernel.py), so TPU and fallback paths agree
            # to the last ulp
            inv = jnp.asarray([1.0 / float(s) for s in std], out.dtype)
            out = (out - jnp.asarray(mean, out.dtype)) * inv
        out = out.astype(out_dtype)
    return out


def avgpool2x(img: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean-pool downsample of (..., H, W, C) — the reference's
    nn.AvgPool2d(2) multiscale chain (patch_sampling.py:552,600-602)."""
    h, w = img.shape[-3], img.shape[-2]
    # truncate odd trailing row/col like torch AvgPool2d with stride 2
    img = img[..., : (h // 2) * 2, : (w // 2) * 2, :]
    summed = jax.lax.reduce_window(
        img, 0.0, jax.lax.add,
        window_dimensions=(1,) * (img.ndim - 3) + (2, 2, 1),
        window_strides=(1,) * (img.ndim - 3) + (2, 2, 1),
        padding="VALID",
    )
    return summed * 0.25


def avgpool2x_single(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 mean-pool of a single-channel (H, W) map."""
    return avgpool2x(x[..., None])[..., 0]


def get_iqa_patches(
    imgs: jnp.ndarray,
    tensors: jnp.ndarray,
    key: jax.Array,
    patch_count: int,
    patch_dim: int,
    patch_sampler: PatchSampler,
    patch_num_scales: int = 1,
    scale_num_samples_ratio: float = DEFAULT_NUM_SAMPLES_RATIO,
    use_aligned_patches: bool = True,
    randomize_patch_scale_order: bool = False,
    img_hw: Optional[jnp.ndarray] = None,
    tile_norm: Optional[tuple] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Sample + extract multiscale patches for a set of images.

    Args:
      imgs:    (K, H, W, 3) raw images in [0,1] (used for the diff map).
      tensors: (K, H, W, 3) normalized images (pixels fed to the model).
      key:     PRNG key for sampling (replaces the reference's global numpy
               RNG + TemporaryNumpySeed, patch_sampling.py:492).
      patch_count / patch_dim / patch_num_scales / scale_num_samples_ratio /
      use_aligned_patches: as in the reference (patch_sampling.py:450-482).
      randomize_patch_scale_order: shuffle the final patch sequence so scales
        interleave instead of being grouped (one shared permutation across
        the K images, like the reference's patch_indices scatter,
        patch_sampling.py:505-508,588-592).
      img_hw: optional traced (2,) int32 TRUE image size when (H, W) is a
        padded canonical bucket (variable-size datasets, SURVEY.md §7):
        sampling, uv normalization, and the multiscale pyramid all confine
        to the true region, so pad pixels never reach the model. The scale
        cap (compute_patch_num_scales) uses the static bucket dims — buckets
        are chosen close to the true sizes (data/buckets.py), so the cap
        matches in practice.
      tile_norm: optional (mean, std, out_dtype) STATIC normalization spec
        applied per gathered tile (see gather_patches). Pass ``tensors`` ==
        raw pixels with it: normalization is affine, so it commutes with
        the mean-pool pyramid — the values match pre-normalizing the whole
        image (to fp rounding), without materializing the normalized copy.

    Returns:
      patches (K, N, P, P, 3), pos (K, N, 2) uv centers in [0,1),
      scales (K, N) int32 or None when a single scale is used.

    Scale ordering matches the reference: extraction starts from the
    coarsest-scale budget (num_patches[-scale-1], patch_sampling.py:554-555),
    so the patch sequence is ordered scale 0 (large) -> S-1 (fine? see
    reference: scale index recorded is the loop index).
    """
    num_imgs, height, width = int(imgs.shape[0]), int(imgs.shape[1]), int(imgs.shape[2])
    if patch_count < patch_num_scales:
        raise ValueError("get_iqa_patches(): patch_count must be >= patch_num_scales.")

    patch_num_scales = compute_patch_num_scales(patch_num_scales, height, width, patch_dim)
    num_patches = compute_num_patches_per_scale(
        patch_count, patch_num_scales, scale_num_samples_ratio)
    use_scales = patch_num_scales > 1

    key_order = None
    if randomize_patch_scale_order:
        key, key_order = jax.random.split(key)
    diff = patch_sampler.compute_diff(imgs)

    patches_per_scale = []
    pos_per_scale = []
    scales_per_scale = []

    cur = tensors  # (K, h, w, 3) at the current pyramid level
    cur_diff = diff
    cur_hw = None if img_hw is None else jnp.asarray(img_hw, jnp.int32)
    num_samples_total = 0
    for scale in range(patch_num_scales):
        n_s = int(num_patches[-scale - 1])
        h, w = int(cur.shape[1]), int(cur.shape[2])
        key, *subkeys = jax.random.split(key, 1 + num_imgs)

        if n_s > 0:
            if use_aligned_patches:
                samples = [patch_sampler.sample(subkeys[0], h, w, patch_dim, n_s,
                                                cur_diff, img_hw=cur_hw)] * num_imgs
            else:
                samples = [patch_sampler.sample(subkeys[k], h, w, patch_dim, n_s,
                                                cur_diff, img_hw=cur_hw)
                           for k in range(num_imgs)]

            # uv centers rescaled to [0,1): (topleft + P/2) / (hw - P/2)
            # (reference: patch_sampling.py:520,559,565-568); in padded-bucket
            # mode the TRUE size normalizes uv so positional embeddings span
            # the real image like they would unpadded
            if cur_hw is None:
                hw_ratio = jnp.array([h - patch_dim // 2, w - patch_dim // 2], jnp.float32)
            else:
                hw_ratio = jnp.maximum(cur_hw - patch_dim // 2, 1).astype(jnp.float32)
            half = patch_dim // 2

            sc_patches = []
            sc_pos = []
            for k in range(num_imgs):
                sc_patches.append(gather_patches(cur[k], samples[k], patch_dim,
                                                 tile_norm=tile_norm))
                uv = (samples[k].T + half) / hw_ratio  # (N_s, 2)
                sc_pos.append(jnp.clip(uv, 0.0, 1.0 - 1e-6))
            patches_per_scale.append(jnp.stack(sc_patches))          # (K, N_s, P, P, 3)
            pos_per_scale.append(jnp.stack(sc_pos))                  # (K, N_s, 2)
            scales_per_scale.append(
                jnp.full((num_imgs, n_s), scale, dtype=jnp.int32))

            num_samples_total += n_s

        if patch_count <= num_samples_total or scale == patch_num_scales - 1:
            break

        cur = avgpool2x(cur)
        if cur_diff is not None:
            cur_diff = avgpool2x_single(cur_diff)
        if cur_hw is not None:
            cur_hw = cur_hw // 2  # true region shrinks with the pyramid

    patches = jnp.concatenate(patches_per_scale, axis=1)
    pos = jnp.concatenate(pos_per_scale, axis=1).astype(jnp.float32)
    scales = jnp.concatenate(scales_per_scale, axis=1) if use_scales else None

    if randomize_patch_scale_order:
        perm = jax.random.permutation(key_order, patches.shape[1])
        patches = patches[:, perm]
        pos = pos[:, perm]
        if scales is not None:
            scales = scales[:, perm]
    return patches, pos, scales
