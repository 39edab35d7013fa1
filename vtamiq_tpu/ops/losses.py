"""Training losses, as jittable JAX functions.

Capability parity with the reference's loss suite (train.py:325-395), with the
key TPU redesign: the reference's pairwise rank loss iterates a Python loop
over all C(B,2) index pairs of GPU scalars (train.py:366-371 — a CPU-sync hot
spot); here it is a single masked (B,B) matrix expression that XLA fuses into
a handful of VPU ops.

Every loss accepts an optional ``valid`` count: the host pipeline pads
partial batches by repeating the last item (data/pipeline.py), and padded
items must not contribute to gradients — the reference never pads (its final
torch batch is simply smaller), so masked losses on a padded batch reproduce
the reference's unpadded math exactly.

Behavioral notes preserved from the reference (SURVEY.md §7 "parity traps"):
- ``loss_func_iqa`` optimizes ``rank + pears`` only; MAE is computed for
  logging but NOT added to the optimized total, and the w_* loss weights are
  threaded but ignored (train.py:387-395). A ``weighted=True`` switch exposes
  the documented-but-dead weighted combination for users who want it.
- pairwise-preference training optimizes MAE only (train.py:526-528).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RANK_LOSS_EPS = 1e-6
PEARS_LOSS_EPS = 1e-6


def _valid_mask(n: int, valid, dtype=jnp.float32):
    """(n,) 0/1 mask of real (non-padded) items; valid=None -> all ones."""
    if valid is None:
        return jnp.ones((n,), dtype)
    return (jnp.arange(n) < valid).astype(dtype)


def mae_loss(d, y, valid=None):
    if valid is None:
        return jnp.mean(jnp.abs(d - y))
    m = _valid_mask(d.shape[0], valid, d.dtype)
    return jnp.sum(jnp.abs(d - y) * m) / jnp.maximum(jnp.sum(m), 1.0)


def mse_loss(d, y, valid=None):
    if valid is None:
        return jnp.mean((d - y) ** 2)
    m = _valid_mask(d.shape[0], valid, d.dtype)
    return jnp.sum((d - y) ** 2 * m) / jnp.maximum(jnp.sum(m), 1.0)


def _safe_norm(x, eps: float):
    """sqrt(sum(x^2) + eps^2): smooth l2 norm whose gradient at x == 0 is
    exactly 0. ``jnp.linalg.norm(x) + eps`` guards only the forward — the
    backward of sqrt at 0 is NaN, so one all-constant batch (zero-variance
    predictions) would poison the whole param pytree through the optimizer
    moments. Observed in the wild: config-4 sweep run 1 (seed 8) collapsed
    a mid-training batch to constant q and every later step was NaN."""
    return jnp.sqrt(jnp.sum(jnp.square(x)) + eps * eps)


def pears_loss(d, y, valid=None, eps: float = PEARS_LOSS_EPS):
    """1 - clamp(pearson(d, y), 0, 1) (reference: train.py:344-354),
    computed over the first ``valid`` items only."""
    m = _valid_mask(d.shape[0], valid, jnp.float32)
    count = jnp.maximum(jnp.sum(m), 1.0)
    dm = (d - jnp.sum(d * m) / count) * m
    ym = (y - jnp.sum(y * m) / count) * m
    r = jnp.dot(dm / _safe_norm(dm, eps), ym / _safe_norm(ym, eps))
    return 1.0 - jnp.clip(r, 0.0, 1.0)


def rank_loss(d, y, valid=None, eps: float = RANK_LOSS_EPS, norm_num: bool = True):
    """Pairwise hinge rank loss over all C(valid,2) pairs, fully vectorized.

    Per pair (i, j):
        rl = max(0, -(y_i - y_j) * (d_i - d_j) / (|y_i - y_j| + eps))
        contribution = rl / max(|d_i|, |d_j|)
    Mean over pairs (reference semantics, train.py:357-376).

    The division is guarded: at d_i == d_j == 0 the reference's loop computes
    0/0 only off the i<j pairs it never visits; the (B,B) matrix form must
    mask BEFORE dividing or the diagonal's 0/0 NaN would poison gradients.
    """
    d = jnp.asarray(d)
    y = jnp.asarray(y)
    n = d.shape[0]
    if n < 2:
        return jnp.zeros((), dtype=d.dtype)

    dd = d[:, None] - d[None, :]                    # (B, B) d_i - d_j
    dy = y[:, None] - y[None, :]                    # (B, B) y_i - y_j
    rl = jnp.maximum(0.0, -dy * dd / (jnp.abs(dy) + eps))
    dp = jnp.abs(d)
    denom = jnp.maximum(dp[:, None], dp[None, :])   # max(|d_i|, |d_j|)
    # upper-triangular mask selects each unordered pair once (i < j);
    # padded items are excluded on both sides of the pair
    mask = jnp.triu(jnp.ones((n, n), dtype=d.dtype), k=1)
    if valid is not None:
        m = _valid_mask(n, valid, d.dtype)
        mask = mask * m[:, None] * m[None, :]
    loss = jnp.sum(jnp.where(mask > 0, rl / jnp.maximum(denom, eps), 0.0))
    if norm_num:
        if valid is None:
            loss = loss / max(1, n * (n - 1) // 2)
        else:
            v = jnp.asarray(valid)
            loss = loss / jnp.maximum(1, v * (v - 1) // 2).astype(d.dtype)
    return loss


def spearman_loss(x, y):
    """Batched soft Spearman correlation over rank indices
    (reference: train.py:325-341; unused by the default train path)."""
    xr = jnp.argsort(x, axis=1).astype(jnp.float32)
    yr = jnp.argsort(y, axis=1).astype(jnp.float32)
    n = x.shape[1]
    upper = 6.0 * jnp.sum((yr - xr) ** 2, axis=1)
    down = n * (n ** 2 - 1.0)
    return jnp.mean(1.0 - upper / down)


def loss_func_iqa(d, y, w_mae_loss: float = 0.75, w_rank_loss: float = 1.0,
                  w_pears_loss: float = 0.2, weighted: bool = False,
                  valid=None):
    """IQA loss: returns (optimized_loss, aux dict of component values).

    Default (reference behavior): optimized = rank + pears; MAE logged only,
    weights ignored. With ``weighted=True``: optimized =
    w_mae*mae + w_rank*rank + w_pears*pears. ``valid`` masks padded items.
    """
    mae_value = mae_loss(d, y, valid)
    rank_value = rank_loss(d, y, valid)
    pears_value = pears_loss(d, y, valid)
    if weighted:
        total = w_mae_loss * mae_value + w_rank_loss * rank_value + w_pears_loss * pears_value
    else:
        total = rank_value + pears_value
    aux = {"mae": mae_value, "rank": rank_value, "pears": pears_value}
    return total, aux


def loss_func_pairwise(p_pred, p_label, valid=None):
    """Pairwise-preference loss: MAE only (reference: train.py:526-528)."""
    return mae_loss(p_pred, p_label, valid)
