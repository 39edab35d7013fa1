"""Profiling / tracing harness.

The reference has only a standalone Timer and tqdm bars (SURVEY.md §5:
"TPU equivalent: jax.profiler trace + block_until_ready timing harness;
per-step tokens/images-per-sec metric"). This module provides both.
"""

from __future__ import annotations

import contextlib
import time
import jax

from .timer import Timer


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Throughput meter for jitted steps: call ``tick(items)`` after each
    step; ``block=True`` synchronizes on a result to measure real device time.

    Example:
        st = StepTimer()
        for batch in loader:
            out = step(...)
            st.tick(len(batch), block_on=out)
        print(st.summary("pairs"))
    """

    def __init__(self, warmup_steps: int = 1):
        self.warmup_steps = warmup_steps
        self._steps = 0
        self._items = 0
        self._t0 = None
        self.timer = Timer("steps")

    def tick(self, num_items: int, block_on=None):
        if block_on is not None:
            jax.block_until_ready(block_on)
        now = time.perf_counter()
        self._steps += 1
        if self._steps <= self.warmup_steps:
            self._t0 = now  # exclude compile/warmup steps
            return
        self._items += num_items
        self.timer.deltas.append(now - self._t0)
        self._t0 = now

    @property
    def items_per_sec(self) -> float:
        total = self.timer.total
        return self._items / total if total > 0 else 0.0

    @property
    def sec_per_step(self) -> float:
        return self.timer.avg

    def summary(self, unit: str = "items") -> str:
        return (f"{self.items_per_sec:.2f} {unit}/sec "
                f"({self.sec_per_step * 1e3:.1f} ms/step, "
                f"{len(self.timer.deltas)} timed steps)")
