"""CAPS — content-aware patch sampling, as shape-static jittable JAX.

Capability parity with the reference's ``data/patch_sampling.py`` (PatchSampler
L46-182, stratified_grid_sampling L224-395, multiscale budgeting L398-447,
get_iqa_patches L450-613), redesigned for TPU/XLA:

- All shapes are static: image size (H, W), patch count N, scale count S are
  Python ints at trace time; the pipeline compiles one program per
  (H, W, N, S) bucket.
- The reference's data-dependent "random dissolve" loop that fixes the total
  cell allocation to exactly N (patch_sampling.py:282-294) is replaced by a
  deterministic largest-remainder apportionment — same first-order
  distribution, single vectorized pass, no while-loop.
- Within-cell sample positions use a randomized (Cranley-Patterson shifted)
  Halton sequence instead of the reference's per-cell grid + numpy
  ``random.choice`` without replacement (patch_sampling.py:353-373): fully
  vectorized, stratified, and low-discrepancy.
- The per-pixel probability map (centerbias + perceptual diff + uniform,
  PatchSampler L86-134) and the cell-sum reduction (view_as_windows at L271-273)
  become ``lax.reduce_window`` ops that XLA fuses on the VPU.

Grid types / diff types keep the reference's names and semantics, including
the quirk that ``GRID_TYPE_PERTURBED_SIMPLE`` forces centerbias/diff weights
to zero (patch_sampling.py:65-69) — the shipped training config therefore
uses uniform jittered-grid sampling, and full CAPS is opt-in.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GRID_TYPE_HALTON = 0
GRID_TYPE_PERTURBED = 1
GRID_TYPE_PERTURBED_SIMPLE = 2

DIFF_TYPE_MAGNITUDE = 0
DIFF_TYPE_DARK = 1
# The reference README advertises MSE/SSIM perceptual-difference maps
# (README.md:77) but never implements them (patch_sampling.py:136-171 has only
# MAGNITUDE and DARK). These two are new capability, beyond the reference:
DIFF_TYPE_MSE = 2
DIFF_TYPE_SSIM = 3

SSIM_WIN = 7          # skimage structural_similarity default window
SSIM_C1 = 0.01 ** 2   # (k1 * L)^2 with L = 1.0
SSIM_C2 = 0.03 ** 2

DEFAULT_NUM_SAMPLES_RATIO = 1.7
GRID_TYPE_PERTURBED_AMOUNT = 0.2

# heuristics from stratified_grid_sampling (patch_sampling.py:232-245)
_CELLSIZE_RATIO = 4.0
_PATCHSIZE_RATIO = 0.75
_PATCH2IMAGE_RATIO = 3.0


# --------------------------------------------------------------------------
# static (Python-int) budget math — mirrors patch_sampling.py:398-447
# --------------------------------------------------------------------------

def compute_patch_num_scales(patch_num_scales: int, h: int, w: int, patch_dim: int) -> int:
    """Cap the scale count by how many 2x downsamples the image supports
    (reference: compute_patch_num_scales, patch_sampling.py:398-411)."""
    if patch_num_scales <= 1:
        return 1
    dim_max = min(h, w)
    patch_num_scales_max = 0
    while dim_max > 1:
        patch_num_scales_max += 1
        dim_max = (dim_max - patch_dim) / 2
    return max(1, min(patch_num_scales_max - 1, patch_num_scales))


def compute_num_patches_per_scale(patch_count: int, patch_num_scales: int,
                                  scale_num_samples_ratio: float = DEFAULT_NUM_SAMPLES_RATIO) -> np.ndarray:
    """Patch counts per scale: ~2^(ratio*i) normalized to the total budget
    (reference: compute_num_patches_per_scale, patch_sampling.py:427-447).
    Index 0 is the coarsest patch size; extraction iterates from the end."""
    num_patches = 2.0 ** (scale_num_samples_ratio * np.arange(patch_num_scales))
    num_patches = np.ceil(num_patches * patch_count / np.sum(num_patches)).astype(int)
    cum = np.cumsum(num_patches)
    for i in range(patch_num_scales):
        if patch_count <= cum[i]:
            num_patches[i] -= cum[i] - patch_count
            num_patches[i + 1:] = 0
            break
    return num_patches


def compute_num_pixels_for_patches(num_patches: Sequence[int], patch_dim: int = 16) -> int:
    """Total sampled pixels across scales (reference: patch_sampling.py:419-424)."""
    num_patches = np.asarray(num_patches)
    s = len(num_patches)
    pixels_per_patch = 2 ** (2 * np.flip(np.arange(s))) * patch_dim * patch_dim
    return int(np.sum(pixels_per_patch * num_patches))


def compute_num_pixels(patch_count: int, patch_num_scales: int,
                       scale_num_samples_ratio: float = DEFAULT_NUM_SAMPLES_RATIO,
                       patch_dim: int = 16) -> int:
    """Pixel budget of a (patch_count, scales, ratio) config
    (reference: compute_num_pixels, patch_sampling.py:414-416)."""
    num_patches = compute_num_patches_per_scale(
        patch_count, patch_num_scales, scale_num_samples_ratio)
    return compute_num_pixels_for_patches(num_patches, patch_dim)


# --------------------------------------------------------------------------
# randomized Halton (vectorized radical inverse)
# --------------------------------------------------------------------------

def _radical_inverse(indices: jnp.ndarray, base: int, num_digits: int) -> jnp.ndarray:
    """Vectorized van der Corput radical inverse with a static digit count."""
    i = indices.astype(jnp.int32)
    result = jnp.zeros(indices.shape, dtype=jnp.float32)
    f = 1.0 / base
    for _ in range(num_digits):
        result = result + f * (i % base).astype(jnp.float32)
        i = i // base
        f = f / base
    return result


def halton_2d(indices: jnp.ndarray) -> jnp.ndarray:
    """(N,) int -> (2, N) Halton points in [0,1)^2 (bases 2 and 3).
    Matches halton_sequence_2d semantics (patch_sampling.py:195-221)."""
    x = _radical_inverse(indices, 2, 24)
    y = _radical_inverse(indices, 3, 16)
    return jnp.stack([x, y], axis=0)


# --------------------------------------------------------------------------
# probability maps
# --------------------------------------------------------------------------

def local_mean(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Normalized uniform-window local mean over the leading two axes of an
    (H, W, ...) array, SAME padding with edge renormalization (divide by the
    per-pixel count of in-bounds window elements)."""
    dims = (win, win) + (1,) * (x.ndim - 2)
    strides = (1,) * x.ndim
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, "SAME")
    ones = jnp.ones(x.shape[:2] + (1,) * (x.ndim - 2), x.dtype)
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, "SAME")
    return summed / count


def ssim_map(ref: jnp.ndarray, dist: jnp.ndarray, win: int = SSIM_WIN,
             c1: float = SSIM_C1, c2: float = SSIM_C2) -> jnp.ndarray:
    """Per-pixel SSIM between two (H, W, C) images in [0,1], uniform window
    (skimage structural_similarity defaults: win=7, k1=0.01, k2=0.03,
    sample covariance normalization N/(N-1)); channels averaged -> (H, W).
    Jittable: local statistics via lax.reduce_window means.
    """
    n = win * win
    cov_norm = n / (n - 1.0)  # skimage's unbiased sample covariance
    mu_r = local_mean(ref, win)
    mu_d = local_mean(dist, win)
    mu_rr = local_mean(ref * ref, win)
    mu_dd = local_mean(dist * dist, win)
    mu_rd = local_mean(ref * dist, win)
    var_r = cov_norm * (mu_rr - mu_r * mu_r)
    var_d = cov_norm * (mu_dd - mu_d * mu_d)
    cov = cov_norm * (mu_rd - mu_r * mu_d)
    num = (2 * mu_r * mu_d + c1) * (2 * cov + c2)
    den = (mu_r * mu_r + mu_d * mu_d + c1) * (var_r + var_d + c2)
    s = num / den
    return jnp.mean(s, axis=-1) if s.ndim == 3 else s


def compute_diff_map(imgs: jnp.ndarray, diff_type: int = DIFF_TYPE_MAGNITUDE,
                     diff_pow: float = 1.0) -> jnp.ndarray:
    """Perceptual-difference sampling map over (K, H, W, 3) pre-normalized
    images in [0,1]; image 0 is the reference (PatchSampler.compute_diff,
    patch_sampling.py:136-171).

    MAGNITUDE: mean |ref - dist| over distorted images, then squared-L2 over
    RGB and power diff_pow/2. DARK: Gaussian-of-darkness weighting of the
    reference image. MSE: per-pixel squared error averaged over distorted
    images, summed over RGB. SSIM: windowed structural DISsimilarity
    (1 - SSIM)/2, averaged over distorted images. MSE and SSIM are the
    README-advertised-but-unimplemented reference options (README.md:77),
    provided here as working capability (BASELINE.json config #2).
    """
    if diff_type == DIFF_TYPE_MAGNITUDE:
        ref = imgs[0]
        diff = jnp.mean(jnp.abs(ref[None] - imgs[1:]), axis=0)  # (H, W, 3)
    elif diff_type == DIFF_TYPE_DARK:
        sigma = 0.1
        diff = jnp.exp(-0.5 * (imgs[0] / sigma) ** 2)
    elif diff_type == DIFF_TYPE_MSE:
        ref = imgs[0]
        sq = jnp.mean((ref[None] - imgs[1:]) ** 2, axis=0)      # (H, W, 3)
        diff = jnp.sum(sq, axis=-1)                             # (H, W)
        return jnp.power(diff, diff_pow)
    elif diff_type == DIFF_TYPE_SSIM:
        ref = imgs[0]
        dssim = jnp.stack([(1.0 - ssim_map(ref, imgs[k])) * 0.5
                           for k in range(1, imgs.shape[0])])
        diff = jnp.clip(jnp.mean(dssim, axis=0), 0.0, 1.0)      # (H, W)
        return jnp.power(diff, diff_pow)
    else:
        raise ValueError(f"Unsupported diff type [{diff_type}]")

    # squared-L2 over color channels; halve the power to fold in the sqrt
    diff = jnp.sum(diff * diff, axis=-1)
    return jnp.power(diff, diff_pow / 2.0)


def gaussian_centerbias_logdensity(size: int = 1024, sigma_y: float = 0.28,
                                   sigma_x: float = 0.40) -> np.ndarray:
    """Analytic anisotropic-Gaussian center-prior log-density.

    Stands in for the reference's MIT1003-derived ``centerbias.npy`` template
    (modules/Attention/deepgaze2/, absent from the mount); the template can be
    passed to :class:`PatchSampler` directly when available.
    """
    ys = (np.arange(size) + 0.5) / size - 0.5
    xs = (np.arange(size) + 0.5) / size - 0.5
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    return -0.5 * ((yy / sigma_y) ** 2 + (xx / sigma_x) ** 2)


def load_centerbias_template(path: Optional[str] = None) -> Optional[np.ndarray]:
    """Load the MIT1003-derived center-prior log-density from disk.

    The reference hardcodes ``modules/Attention/deepgaze2/centerbias.npy``
    (patch_sampling.py:47,79-80).  Here the template resolves, in order, from
    ``path``, ``$VTAMIQ_CENTERBIAS_PATH``, and the packaged asset location
    ``vtamiq_tpu/assets/centerbias.npy``; returns None when no file exists
    (callers fall back to :func:`gaussian_centerbias_logdensity`).
    """
    import os
    candidates = [path, os.environ.get("VTAMIQ_CENTERBIAS_PATH"),
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), "assets", "centerbias.npy")]
    for cand in candidates:
        if cand and os.path.isfile(cand):
            template = np.load(cand)
            if template.ndim != 2:
                raise ValueError(
                    f"centerbias template must be 2-D log-density, got "
                    f"shape {template.shape} from {cand}")
            return np.asarray(template, np.float32)
    return None


def centerbias_prob(template_logdensity: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Resize the log-density to (h, w), renormalize, softmax to probabilities
    (PatchSampler.centerbias_prob, patch_sampling.py:173-182)."""
    cb = jax.image.resize(template_logdensity, (h, w), method="nearest")
    cb = cb - jax.scipy.special.logsumexp(cb)
    cb = jnp.exp(cb)
    return cb / jnp.sum(cb)


# --------------------------------------------------------------------------
# stratified sampling
# --------------------------------------------------------------------------

def _largest_remainder_alloc(probs: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Apportion exactly ``num_samples`` across cells proportionally to
    ``probs`` (flat, sums to 1), by deterministic largest-remainder rounding.

    NOTE: exactly proportional — which the reference's allocation is NOT; see
    :func:`_dissolve_alloc` (used by the weighted sampler) for the
    reference-matching rule. Kept for callers that want unbiased
    apportionment."""
    target = probs * num_samples
    base = jnp.floor(target).astype(jnp.int32)
    remainder = target - base
    deficit = num_samples - jnp.sum(base)  # in [0, num_cells)
    order = jnp.argsort(-remainder)  # cells by descending fractional part
    rank_of_cell = jnp.argsort(order)
    extra = (rank_of_cell < deficit).astype(jnp.int32)
    return base + extra


def _dissolve_alloc(key: jax.Array, probs: jnp.ndarray, num_samples: int,
                    passes: int = 12) -> jnp.ndarray:
    """Reference-matching cell allocation: ceil(p*N) then "random dissolve"
    removal weighted toward LOW-count cells (patch_sampling.py:277-294).

    The reference's while-loop is data-dependent; here each pass removes the
    EXPECTED per-cell amount of one reference adjustment round
    (P(cell hit >= once in D draws) = 1 - (1 - p_adjust)^D, matching the
    only-one-adjustment-per-pass indexing note at patch_sampling.py:292), on
    real-valued counts, unrolled a fixed ``passes`` times. The real totals are
    then integerized to exactly N with remainder-weighted random rounding
    (Gumbel top-k), preserving both the expectation and the reference's
    draw-to-draw variability for fractional cells.

    Verified against the reference empirically: mean per-cell counts match
    within Monte-Carlo noise (tests/test_parity_sampling.py TestKSParity).
    """
    c = jnp.ceil(probs * num_samples)
    for _ in range(passes):
        total = jnp.sum(c)
        d = total - num_samples
        pa = c / total
        pa = (jnp.max(pa) + 1e-3) - pa
        pa = pa / jnp.sum(pa)
        expected_removal = 1.0 - (1.0 - pa) ** d
        expected_removal = jnp.minimum(expected_removal, c)
        s = jnp.sum(expected_removal)
        expected_removal = expected_removal * jnp.minimum(1.0, d / jnp.maximum(s, 1e-9))
        c = jnp.where(d > 0, c - expected_removal, c)
    # force exact total before integerizing (guards non-converged edge cases)
    c = c * (num_samples / jnp.maximum(jnp.sum(c), 1e-9))
    base = jnp.floor(c).astype(jnp.int32)
    rem = c - base
    deficit = num_samples - jnp.sum(base)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, rem.shape) + 1e-12) + 1e-12)
    score = jnp.where(rem > 1e-9, jnp.log(rem + 1e-12) + gumbel, -jnp.inf)
    order = jnp.argsort(-score)
    rank_of_cell = jnp.argsort(order)
    extra = (rank_of_cell < deficit).astype(jnp.int32)
    return base + extra


def _perturbed_simple_grid_dims(h: int, w: int, num_samples: int) -> Tuple[int, int]:
    """Grid dims for the single-cell PERTURBED_SIMPLE path
    (patch_sampling.py:308,321-325): aspect-corrected grid with >= N points."""
    aspect = h / w
    width = max(1, int(math.ceil(math.sqrt(num_samples / aspect))))
    height = max(1, int(math.ceil(width * aspect)))
    while height * width < num_samples:  # guard for extreme aspect ratios
        width += 1
        height = max(1, int(math.ceil(width * aspect)))
    return height, width


def sample_positions_uniform(key: jax.Array, h: int, w: int, patch_dim: int,
                             num_samples: int,
                             perturbed_amount: float = GRID_TYPE_PERTURBED_AMOUNT,
                             img_hw: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """PERTURBED_SIMPLE sampling: one aspect-corrected jittered grid over the
    whole image; returns float top-left coords, shape (2, N) in
    [0, h-P] x [0, w-P] (patch_sampling.py:236-237,321-327,379-381).

    ``img_hw``: optional traced (2,) TRUE image size when (h, w) is a padded
    canonical bucket (SURVEY.md §7 "variable image sizes"); the unit grid
    maps onto the true region [0, hw-P] instead of the bucket, so padded
    pixels are never sampled. Grid aspect correction uses the static bucket
    dims (trace-time), placement uses the traced true dims.
    """
    height, width = _perturbed_simple_grid_dims(h, w, num_samples)
    key_sel, key_jit = jax.random.split(key)

    # choose N distinct grid cells (random permutation of the static grid)
    perm = jax.random.permutation(key_sel, height * width)[:num_samples]
    gi = (perm // width).astype(jnp.float32)  # row index in [0, height)
    gj = (perm % width).astype(jnp.float32)   # col index in [0, width)

    # jitter in units of grid cells: U(-1,1) * 2 * perturbed_amount
    jitter = (2.0 * jax.random.uniform(key_jit, (2, num_samples)) - 1.0) * 2.0 * perturbed_amount
    pos_i = (gi + jitter[0]) / height + 1.0 / (2.0 * height)
    pos_j = (gj + jitter[1]) / width + 1.0 / (2.0 * width)
    if img_hw is None:
        span_i, span_j = h - patch_dim, w - patch_dim
    else:
        span_i = jnp.maximum(img_hw[0] - patch_dim, 0).astype(jnp.float32)
        span_j = jnp.maximum(img_hw[1] - patch_dim, 0).astype(jnp.float32)
    pos_i = jnp.clip(pos_i, 0.0, 1.0) * span_i
    pos_j = jnp.clip(pos_j, 0.0, 1.0) * span_j
    return jnp.stack([pos_i, pos_j], axis=0)


def _cell_layout(h: int, w: int, patch_dim: int, num_samples: int) -> Tuple[int, int, int]:
    """Static cell size + grid dims for weighted stratified sampling
    (patch_sampling.py:240-253)."""
    cell_size_d = math.sqrt(h * w / num_samples * _CELLSIZE_RATIO)
    cell_size_min = _PATCHSIZE_RATIO * patch_dim
    cell_size_max = max(h, w) / patch_dim * _PATCH2IMAGE_RATIO
    cell_size = int(max(cell_size_min, min(cell_size_max, cell_size_d)))
    cell_size = max(1, cell_size)
    sh = max(1, int(math.ceil((h - patch_dim) / cell_size)))
    sw = max(1, int(math.ceil((w - patch_dim) / cell_size)))
    return cell_size, sh, sw


def _cell_prob_sums(sample_prob: jnp.ndarray, cell_size: int, sh: int, sw: int,
                    patch_dim: int) -> jnp.ndarray:
    """Sum per-pixel probabilities over overlapping cell windows of size
    (cell+P-1) with stride cell (reference's view_as_windows+sum,
    patch_sampling.py:262-273), via lax.reduce_window."""
    h, w = sample_prob.shape
    pad_h = cell_size * sh + patch_dim - h
    pad_w = cell_size * sw + patch_dim - w
    padded = jnp.pad(sample_prob, ((0, max(0, pad_h)), (0, max(0, pad_w))))
    win = cell_size + patch_dim - 1
    sums = jax.lax.reduce_window(
        padded, 0.0, jax.lax.add,
        window_dimensions=(win, win),
        window_strides=(cell_size, cell_size),
        padding="VALID",
    )
    sums = sums[:sh, :sw]
    return sums / jnp.sum(sums)


def sample_positions_weighted(key: jax.Array, sample_prob: jnp.ndarray, h: int, w: int,
                              patch_dim: int, num_samples: int,
                              grid_type: int = GRID_TYPE_PERTURBED,
                              perturbed_amount: float = GRID_TYPE_PERTURBED_AMOUNT,
                              img_hw: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Weighted stratified sampling: allocate the patch budget across a cell
    grid proportionally to the probability map, then place samples within
    each cell. Returns (2, N) float top-left coords.

    TPU-first replacement for stratified_grid_sampling with a non-uniform
    probability map (patch_sampling.py:224-395). Placement matches the
    reference per grid type:

    - HALTON: consecutive chunks of ONE global Halton sequence per cell
      (patch_sampling.py:311,349-351) — sample k in allocation order takes
      halton(k). A global Cranley-Patterson random shift decorrelates draws
      (the reference instead relies on randomize_cell_order + the numpy seed).
    - PERTURBED / PERTURBED_SIMPLE-with-weights: per-cell jittered grid of
      width ceil(sqrt(n_cell)): each sample takes a distinct grid slot, plus
      U(-1,1)*2*perturbed_amount jitter in slot units, plus a half-slot
      offset (patch_sampling.py:355-365). Distinct slots come from
      stratified-slot selection (rank r -> a random slot in stratum r of
      width^2/n), replacing the reference's np.random.choice without
      replacement — same uniform marginal, vectorized and shape-static.
    """
    cell_size, sh, sw = _cell_layout(h, w, patch_dim, num_samples)
    num_cells = sh * sw

    key_alloc, key_shift, key_slot, key_jit = jax.random.split(key, 4)

    if img_hw is not None:
        # padded-bucket mode: zero probability beyond the TRUE image region so
        # pad cells receive no allocation; positions are clipped into the
        # true region below
        row_valid = jnp.arange(h) < img_hw[0]
        col_valid = jnp.arange(w) < img_hw[1]
        sample_prob = sample_prob * (row_valid[:, None] & col_valid[None, :])

    cell_probs = _cell_prob_sums(sample_prob, cell_size, sh, sw, patch_dim).reshape(-1)
    counts = _dissolve_alloc(key_alloc, cell_probs, num_samples)  # (C,)

    # map each sample k to its cell + intra-cell rank, fully vectorized
    cum = jnp.cumsum(counts)
    k = jnp.arange(num_samples)
    cell_of_k = jnp.searchsorted(cum, k, side="right")
    start_of_cell = cum - counts
    rank_in_cell = k - start_of_cell[cell_of_k]

    if grid_type == GRID_TYPE_HALTON:
        # global Halton sequence chunked across cells in allocation order,
        # with a global random shift (torus translation keeps discrepancy)
        shift = jax.random.uniform(key_shift, (2, 1))
        pos01 = jnp.mod(halton_2d(k) + shift, 1.0)              # (2, N)
    else:
        # per-cell jittered grid (PERTURBED family)
        n_c = jnp.maximum(counts[cell_of_k], 1).astype(jnp.float32)   # (N,)
        width = jnp.ceil(jnp.sqrt(n_c))                               # (N,)
        slots = width * width
        # stratified distinct-slot pick: rank r gets a uniform slot within
        # [r*slots/n, (r+1)*slots/n)
        stride = slots / n_c
        u = jax.random.uniform(key_slot, (num_samples,))
        slot = jnp.floor((rank_in_cell.astype(jnp.float32) + u) * stride)
        slot = jnp.minimum(slot, slots - 1.0)
        gi = jnp.floor(slot / width)   # row in [0, width)
        gj = slot - gi * width         # col in [0, width)
        jitter = (2.0 * jax.random.uniform(key_jit, (2, num_samples)) - 1.0) \
            * 2.0 * perturbed_amount
        pos_i01 = jnp.clip((gi + jitter[0]) / width + 0.5 / width, 0.0, 1.0)
        pos_j01 = jnp.clip((gj + jitter[1]) / width + 0.5 / width, 0.0, 1.0)
        pos01 = jnp.stack([pos_i01, pos_j01], axis=0)           # (2, N)

    # edge-cell rescale so partial edge cells stay inside the image
    # (reference: jcell_dec/icell_dec, patch_sampling.py:256-259,384-388)
    jdec = ((h - patch_dim) / cell_size) % 1.0
    idec = ((w - patch_dim) / cell_size) % 1.0
    jdec = 1.0 if jdec < 1e-3 else jdec
    idec = 1.0 if idec < 1e-3 else idec
    ci = cell_of_k // sw
    cj = cell_of_k % sw
    row_scale = jnp.where(ci == sh - 1, jdec, 1.0)
    col_scale = jnp.where(cj == sw - 1, idec, 1.0)

    pos_i = (ci.astype(jnp.float32) + pos01[0] * row_scale) * cell_size
    pos_j = (cj.astype(jnp.float32) + pos01[1] * col_scale) * cell_size
    if img_hw is None:
        max_i, max_j = h - patch_dim, w - patch_dim
    else:
        max_i = jnp.maximum(img_hw[0] - patch_dim, 0).astype(jnp.float32)
        max_j = jnp.maximum(img_hw[1] - patch_dim, 0).astype(jnp.float32)
    pos_i = jnp.clip(pos_i, 0.0, max_i)
    pos_j = jnp.clip(pos_j, 0.0, max_j)
    return jnp.stack([pos_i, pos_j], axis=0)


# --------------------------------------------------------------------------
# PatchSampler
# --------------------------------------------------------------------------

@dataclasses.dataclass
class PatchSampler:
    """Sampling-probability composer + position sampler.

    Mirrors the reference PatchSampler's constructor semantics
    (patch_sampling.py:46-84): with GRID_TYPE_PERTURBED_SIMPLE the centerbias
    and diff weights are forced to zero (with a warning) and sampling is a
    uniform jittered grid.
    """

    centerbias_weight: float = 0.0
    diff_weight: float = 0.0
    uniform_weight: float = 1.0
    grid_type: int = GRID_TYPE_PERTURBED_SIMPLE
    diff_type: int = DIFF_TYPE_MAGNITUDE
    perturbed_amount: float = GRID_TYPE_PERTURBED_AMOUNT
    centerbias_template: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.grid_type == GRID_TYPE_PERTURBED_SIMPLE:
            if self.centerbias_weight > 0 or self.diff_weight > 0:
                from ..utils import log_warn
                log_warn("PatchSampler: GRID_TYPE_PERTURBED_SIMPLE forces uniform "
                         "sampling; centerbias/diff weights set to 0.")
            self.centerbias_weight = 0.0
            self.diff_weight = 0.0
        self.centerbias_weight = max(0.0, self.centerbias_weight)
        self.diff_weight = max(0.0, self.diff_weight)
        self.uniform_weight = max(0.0, self.uniform_weight)
        if self.centerbias_weight + self.diff_weight + self.uniform_weight < 1e-6:
            raise ValueError("PatchSampler: total weight must be non-zero.")
        if self.centerbias_weight > 0 and self.centerbias_template is None:
            self.centerbias_template = load_centerbias_template()
        if self.centerbias_weight > 0 and self.centerbias_template is None:
            self.centerbias_template = gaussian_centerbias_logdensity()

    @property
    def uses_diff(self) -> bool:
        return self.diff_weight > 0

    @property
    def is_uniform(self) -> bool:
        return self.diff_weight == 0 and self.centerbias_weight == 0

    def compute_diff(self, imgs: jnp.ndarray, diff_pow: float = 1.0) -> Optional[jnp.ndarray]:
        """(K, H, W, 3) images in [0,1] -> (H, W) diff map, or None when the
        diff component is unused (patch_sampling.py:136-139)."""
        if not self.uses_diff:
            return None
        return compute_diff_map(imgs, self.diff_type, diff_pow)

    def sample_prob(self, h: int, w: int, diff: Optional[jnp.ndarray],
                    img_hw: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Per-pixel probability map: centerbias + diff + uniform mix,
        normalized (patch_sampling.py:101-126). With ``img_hw`` (padded
        bucket mode) the diff std-normalization runs over the TRUE region
        only, so pad zeros do not deflate the diff weighting."""
        prob = jnp.full((h, w), self.uniform_weight, dtype=jnp.float32)
        if self.centerbias_weight > 0:
            cb = centerbias_prob(jnp.asarray(self.centerbias_template, dtype=jnp.float32), h, w)
            prob = prob + self.centerbias_weight * (cb / jnp.max(cb))
        if self.diff_weight > 0:
            if diff is None:
                raise ValueError("PatchSampler: 'diff' is required for difference-based sampling.")
            if img_hw is None:
                std = jnp.std(diff)
            else:
                valid = ((jnp.arange(h)[:, None] < img_hw[0]) &
                         (jnp.arange(w)[None, :] < img_hw[1])).astype(jnp.float32)
                count = jnp.maximum(jnp.sum(valid), 1.0)
                mean = jnp.sum(diff * valid) / count
                var = jnp.sum(((diff - mean) ** 2) * valid) / count
                std = jnp.sqrt(var)
            normed = jnp.where(std > 1e-6, diff / jnp.maximum(std, 1e-6), 0.0)
            prob = prob + self.diff_weight * normed
        return prob / jnp.sum(prob)

    def sample(self, key: jax.Array, h: int, w: int, patch_dim: int, num_samples: int,
               diff: Optional[jnp.ndarray] = None,
               img_hw: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Sample (2, N) float top-left patch coordinates; ``img_hw`` is the
        traced TRUE image size when (h, w) is a padded canonical bucket."""
        if self.is_uniform:
            return sample_positions_uniform(key, h, w, patch_dim, num_samples,
                                            self.perturbed_amount, img_hw=img_hw)
        prob = self.sample_prob(h, w, diff, img_hw=img_hw)
        return sample_positions_weighted(key, prob, h, w, patch_dim, num_samples,
                                         self.grid_type, self.perturbed_amount,
                                         img_hw=img_hw)
