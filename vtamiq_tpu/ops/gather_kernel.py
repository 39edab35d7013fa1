"""Pallas DMA patch-gather kernel (EXPERIMENTAL — interpret-mode only).

Extracts N PxPx3 pixel blocks at arbitrary (row, col) offsets from an image
batch resident in HBM, overlapping block DMAs within each grid step. This is
the hand-scheduled alternative to the XLA dynamic-slice gather in
ops/extraction.py (reference hot loop: numpy fancy indexing in DataLoader
workers, patch_sampling.py:529-545).

STATUS: numerically exact under the Pallas interpreter, but the current
Mosaic toolchain rejects DMA source slices with dynamic offsets in the
minor (W) dimension, so hardware compilation fails. The production pipeline
uses the XLA dynamic-slice gather (already within ~2x of a bandwidth-bound
ideal); revisit with a row-granularity DMA + in-VMEM column select when the
toolchain supports it.

Layout: images (B, H, W, C) HBM; indices (B, N) int32 row/col top-lefts
(scalar-prefetched so the kernel can compute DMA source slices); output
(B, N, P, P, C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_kernel(ti_ref, tj_ref, img_ref, out_ref, scratch, sems, *,
                   patch_dim: int, block_n: int):
    """Grid (B, N // block_n). Image stays in HBM (ANY); each step DMAs
    block_n patch slices into VMEM scratch concurrently, then writes the
    output block."""
    b = pl.program_id(0)
    nb = pl.program_id(1)

    def start(p, _):
        idx = nb * block_n + p
        dma = pltpu.make_async_copy(
            img_ref.at[b, pl.ds(ti_ref[b, idx], patch_dim),
                       pl.ds(tj_ref[b, idx], patch_dim), :],
            scratch.at[p],
            sems.at[p],
        )
        dma.start()
        return 0

    jax.lax.fori_loop(0, block_n, start, 0)

    def wait(p, _):
        idx = nb * block_n + p
        pltpu.make_async_copy(
            img_ref.at[b, pl.ds(ti_ref[b, idx], patch_dim),
                       pl.ds(tj_ref[b, idx], patch_dim), :],
            scratch.at[p],
            sems.at[p],
        ).wait()
        return 0

    jax.lax.fori_loop(0, block_n, wait, 0)
    out_ref[0] = scratch[...]


def pallas_gather_patches(imgs: jnp.ndarray, ti: jnp.ndarray, tj: jnp.ndarray,
                          patch_dim: int = 16, block_n: int = 50) -> jnp.ndarray:
    """imgs (B, H, W, C), ti/tj (B, N) int32 -> (B, N, P, P, C).

    ``block_n`` patches are DMA'd concurrently per grid step; N must be a
    multiple of block_n (callers pad or pick a divisor).
    """
    b, h, w, c = imgs.shape
    n = ti.shape[1]
    if n % block_n != 0:
        # fall back to the largest divisor <= block_n
        for cand in range(min(block_n, n), 0, -1):
            if n % cand == 0:
                block_n = cand
                break

    grid = (b, n // block_n)
    kernel = functools.partial(_gather_kernel, patch_dim=patch_dim,
                               block_n=block_n)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # imgs stay in HBM
            ],
            out_specs=pl.BlockSpec(
                (1, block_n, patch_dim, patch_dim, c),
                lambda b, nb, ti, tj: (b, nb, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_n, patch_dim, patch_dim, c), imgs.dtype),
                pltpu.SemaphoreType.DMA((block_n,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, patch_dim, patch_dim, c), imgs.dtype),
    )(ti, tj, imgs)
