"""Retry-with-backoff for transient device faults.

This environment's TPU service intermittently fails a dispatch with
``UNAVAILABLE: TPU device error`` (docs/OPERATIONS.md); the reference has an
analogous skip-batch workaround for transient host decode faults
(train.py:503-510). The engine wraps every step dispatch with
:func:`retry_transient` so a single fault does not kill a multi-hour run.

Caveat for donated buffers: the fused train step donates params/opt_state
(jit donate_argnums). If a fault strikes AFTER the runtime consumed the
donated buffers, the retry fails with a "buffer deleted" secondary error.
The engine classifies that case (engine._buffer_casualty) and AUTO-RECOVERS
in-epoch: params + optimizer state rebuild from latest.npz and the faulted
batch is redone (tests/test_engine.py::TestPostDonationRecovery). In
practice the transient faults observed here occur at program launch, before
donation takes effect.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Sequence

# Substrings identifying retriable transient faults in the exception text.
# Deliberately narrow: RESOURCE_EXHAUSTED (OOM) or INVALID_ARGUMENT are real
# errors a retry cannot fix.
TRANSIENT_MARKERS = (
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
)


def is_transient(exc: BaseException,
                 markers: Sequence[str] = TRANSIENT_MARKERS) -> bool:
    msg = str(exc)
    return any(m in msg for m in markers)


def retry_transient(fn: Callable, *args,
                    max_retries: int = 2,
                    base_delay: float = 1.0,
                    markers: Sequence[str] = TRANSIENT_MARKERS,
                    log: Optional[Callable[[str], None]] = None,
                    sleep: Callable[[float], None] = time.sleep,
                    **kwargs):
    """Call ``fn(*args, **kwargs)``; on a transient fault retry up to
    ``max_retries`` times with exponential backoff. Non-transient errors and
    the final failed attempt propagate unchanged."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered by marker below
            if attempt >= max_retries or not is_transient(e, markers):
                raise
            delay = base_delay * (2.0 ** attempt)
            attempt += 1
            if log is not None:
                log(f"Transient device fault (retry {attempt}/{max_retries} "
                    f"in {delay:.1f}s): {str(e)[:200]}")
            sleep(delay)
