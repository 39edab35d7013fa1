"""Shared TPU measurement harness for bench.py and tools/profiler.py.

One implementation of the methodology both tools must follow on this
tunneled-TPU environment (CLAUDE.md env rules):

- timed results are consumed via ``float()`` — the only reliable completion
  barrier on this service (``block_until_ready`` lies post-compile);
- the service memoizes executions by (program, inputs) across processes, so
  every timed call must vary its inputs (callers fold the trial index into
  their PRNG key or pass it as a traced scalar);
- readings faster than the physical roofline ``bound`` are rejected as
  non-executed replays.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["fresh_pair_batch", "timed_median", "timed_stats",
           "ImplausiblyFast"]


class ImplausiblyFast(RuntimeError):
    """Every trial returned faster than physics allows: the relay served
    memoized replays and nothing measurably executed."""


def fresh_pair_batch(batch: int, h: int, w: int, seed_extra: int = 0):
    """Time-seeded (batch, 2, h, w, 3) fp32 ref/dist raw images + PRNG key.

    Time-based seeds keep the (program, inputs) pair unique per process so
    the first dispatch is never a cross-process replay."""
    import jax
    import jax.numpy as jnp

    s = (int(time.time_ns()) + seed_extra) & 0x7FFFFFFF
    r = np.random.default_rng(s)
    raw = jnp.asarray(r.uniform(0, 1, (batch, 2, h, w, 3)), jnp.float32)
    # settle the host->device copy NOW: jnp.asarray transfers
    # asynchronously and the first consumer blocks on it (~4.5 s for 75 MB
    # through this relay) — without this the first timed trial after a
    # fresh batch absorbs the transfer (int8 A/B v2's A/A control measured
    # the first-slot arm 2.7x slower from exactly this, 2026-08-19)
    float(raw.ravel()[0])
    return raw, jax.random.PRNGKey(s)


def timed_stats(fn, pairs_per_call: float, bound: float,
                trials: int = 3) -> dict:
    """{median, min, max, trials} pairs/sec over ``trials`` plausible
    timings of ``fn(t)`` — the per-config spread VERDICT r03 item 3 demands
    so round-over-round deltas can be told apart from relay noise.

    ``fn(t)`` must consume its result host-side (end in a value ``float()``
    can take) and must vary its device inputs with ``t``. Readings implying
    a rate past ``bound`` pairs/sec are discarded; raises ImplausiblyFast
    if no trial survives (two spare attempts are allowed)."""
    min_dt = pairs_per_call / bound
    times = []
    for t in range(trials + 2):
        t0 = time.perf_counter()
        float(fn(t))
        dt = time.perf_counter() - t0
        if dt >= min_dt:
            times.append(dt)
        if len(times) >= trials:
            break
    if not times:
        raise ImplausiblyFast("all trials implausibly fast (relay replay)")
    rates = sorted(pairs_per_call / dt for dt in times)
    return {"median": rates[len(rates) // 2], "min": rates[0],
            "max": rates[-1], "trials": len(rates)}


def timed_median(fn, pairs_per_call: float, bound: float,
                 trials: int = 2) -> float:
    """Median pairs/sec (see timed_stats; kept for single-number callers).

    Note the median convention: with an even trial count this returns the
    UPPER middle rate (sorted()[n//2]), matching round-2/3 readings."""
    return timed_stats(fn, pairs_per_call, bound, trials)["median"]
