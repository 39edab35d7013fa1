"""Pallas patch-gather kernel: image resident in VMEM, dynamic row slice +
dynamic lane rotate per patch.

The XLA dynamic-slice gather (ops/extraction.py) is DMA-descriptor-rate
bound: 2x500 tiny (16, 16, 3) strided HBM slices per pair cost ~1.2 ms/pair
on v5e — half the fused 500-patch pipeline (docs/OPERATIONS.md gather
table; reproduce with `tools/profiler.py extract`).
This kernel instead:

1. brings the WHOLE image into VMEM once per grid step (a (384, 512*3) bf16
   image is 1.2 MB against v5e's ~16 MB more-than-sufficient VMEM),
2. for each patch, loads a (P, W*C) row band at a DYNAMIC sublane offset
   (supported by Mosaic), rotates it along lanes by the DYNAMIC column
   offset (``pltpu.roll``), and stores the leading (P, P*C) columns.

No per-patch HBM DMA descriptors: HBM traffic is exactly image-in +
patches-out. Round 1's attempt (HBM-source DMAs with dynamic minor-dim
offsets) was rejected by Mosaic; the VMEM-resident + roll formulation
compiles on current toolchains.

The gather is data movement only — no gradient ever flows through it (the
train step extracts patches OUTSIDE the loss closure; only params are
differentiated), so no custom VJP is needed.

Used automatically by ops/extraction.gather_patches on TPU backends for
images that fit the VMEM budget; XLA dynamic-slice everywhere else
(CPU tests, oversized images).

Reference hot loop this replaces: numpy fancy indexing in DataLoader
workers (patch_sampling.py:529-545).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# images larger than this (bytes, as the kernel holds them) stay on the XLA
# dynamic-slice path
VMEM_IMAGE_BYTE_LIMIT = 8 * 1024 * 1024
# combined image + output-block VMEM budget: the kernel runs with grid=(1,),
# so the ENTIRE (N*P, P*C) output block is VMEM-resident alongside the image
# (v5e has ~16 MB/core; leave headroom for the band/rotate temporaries)
VMEM_TOTAL_BYTE_LIMIT = 12 * 1024 * 1024


def _vmem_gather_kernel(ti_ref, tj_ref, img_ref, out_ref, *,
                        patch_dim: int, num_patches: int, c: int,
                        mean=None, inv_std=None):
    """Grid step = one image. img_ref: (H, W*C) VMEM block; ti/tj: (N,)
    scalar-prefetched top-left coords; out_ref: (N*P, P*C) VMEM block.

    Mosaic only allows dynamic sublane offsets it can prove 8-aligned, so
    each patch loads an 8-aligned (P+8)-row band and rotates the target
    rows to the top; the column offset is a dynamic lane rotate.

    ``mean``/``inv_std``: optional static per-channel normalization fused
    into the tile store ((x - mean) * inv_std, then cast to the output
    dtype) — the model-input normalize costs nothing extra here, and the
    full normalized image is never materialized."""
    h, wc = img_ref.shape
    band_rows = patch_dim + 8

    mean_row = inv_row = None
    if mean is not None:
        # per-lane channel constants from static floats (pallas kernels
        # cannot capture traced array constants)
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, patch_dim * c), 1) % c

        def chanvec(vals):
            v = jnp.full((1, patch_dim * c), float(vals[0]), jnp.float32)
            for ci in range(1, c):
                v = jnp.where(idx == ci, float(vals[ci]), v)
            return v

        mean_row = chanvec(mean)
        inv_row = chanvec(inv_std)

    def body(k, carry):
        i = ti_ref[k]
        j = tj_ref[k]
        base = pl.multiple_of(
            jnp.minimum((i // 8) * 8, h - band_rows), 8)
        band = img_ref[pl.ds(base, band_rows), :]           # (P+8, W*C)
        # rotate rows so row i lands at 0 (np.roll: out[r] = in[(r-s) % R])
        band = pltpu.roll(band, band_rows - (i - base), 0)
        # rotate so columns [j*c, j*c + P*c) land at [0, P*c)
        rot = pltpu.roll(band[:patch_dim], wc - j * c, 1)
        tile = rot[:, : patch_dim * c]
        if mean_row is not None:
            tile = (tile - mean_row) * inv_row
        out_ref[pl.ds(k * patch_dim, patch_dim), :] = tile.astype(out_ref.dtype)
        return carry

    jax.lax.fori_loop(0, num_patches, body, 0)


def pallas_gather_patches(img: jnp.ndarray, ti: jnp.ndarray, tj: jnp.ndarray,
                          patch_dim: int, norm_mean=None, norm_std=None,
                          out_dtype=None) -> jnp.ndarray:
    """img (H, W, C), ti/tj (N,) int32 (pre-clipped to [0, dim-P]) ->
    (N, P, P, C) pixel blocks.

    ``norm_mean``/``norm_std``: optional STATIC per-channel tuples; the
    normalize fuses into the tile store. ``out_dtype`` defaults to the
    input dtype."""
    h, w, c = img.shape
    n = ti.shape[0]
    out_dtype = jnp.dtype(out_dtype or img.dtype)
    if jnp.dtype(img.dtype).itemsize < 4:
        # Mosaic's dynamic rotate requires 32-bit data; the fp32 round-trip
        # adds ~3 MB/image of fused cast traffic — noise next to the
        # ~1.2 ms/pair the kernel saves over the XLA gather
        img = img.astype(jnp.float32)
    flat = img.reshape(h, w * c)
    inv_std = None if norm_std is None else tuple(1.0 / float(s) for s in norm_std)
    kernel = functools.partial(
        _vmem_gather_kernel, patch_dim=patch_dim, num_patches=n, c=c,
        mean=None if norm_mean is None else tuple(map(float, norm_mean)),
        inv_std=inv_std)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=[pl.BlockSpec((h, w * c), lambda g, ti, tj: (0, 0))],
            out_specs=pl.BlockSpec((n * patch_dim, patch_dim * c),
                                   lambda g, ti, tj: (0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n * patch_dim, patch_dim * c), out_dtype),
    )(ti.astype(jnp.int32), tj.astype(jnp.int32), flat)
    return out.reshape(n, patch_dim, patch_dim, c)


def vmem_gather_supported(img_shape, dtype, patch_dim: int = 16,
                          num_patches: int = 0, out_dtype=None) -> bool:
    """True when the image AND output block fit the kernel's VMEM budget and
    the geometry supports 8-aligned band loads.

    Guards every kernel precondition: H a multiple of 8 (so the band base
    ``min((i//8)*8, h - band_rows)`` is 8-aligned only if ``band_rows =
    patch_dim + 8`` is too — hence ``patch_dim % 8 == 0``), at least one full
    band (``h >= band_rows``; otherwise the clamped base goes negative and
    the load reads out of bounds), and the VMEM footprint of the IMAGE AS THE
    KERNEL HOLDS IT — sub-32-bit inputs are upcast to fp32 before the call
    (pallas_gather_patches), so the budget uses >= 4-byte items.

    ``num_patches`` / ``out_dtype``: the kernel runs with grid=(1,), so the
    whole (N*P, P*C) output block is VMEM-resident too — large patch budgets
    (e.g. 5000 fp32 patches ~ 15 MB) must fall back to XLA or Mosaic fails
    to compile with no fallback. out_dtype defaults to the input dtype
    (pallas_gather_patches' default)."""
    h, w, c = img_shape
    if patch_dim <= 0 or patch_dim % 8 != 0:
        return False
    band_rows = patch_dim + 8
    itemsize = max(4, jnp.dtype(dtype).itemsize)
    img_bytes = h * w * c * itemsize
    out_itemsize = jnp.dtype(out_dtype if out_dtype is not None else dtype).itemsize
    out_bytes = num_patches * patch_dim * patch_dim * c * out_itemsize
    return (h % 8 == 0 and h >= band_rows
            # Mosaic's tpu.dynamic_rotate needs a lane-aligned minor dim
            # (observed: "unsupported unaligned shape" at w*c=960 on v5e)
            and (w * c) % 128 == 0
            and img_bytes <= VMEM_IMAGE_BYTE_LIMIT
            and img_bytes + out_bytes <= VMEM_TOTAL_BYTE_LIMIT)
