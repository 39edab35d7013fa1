"""Host-side RNG helpers.

``TemporaryNumpySeed`` mirrors the reference utility
(utils/misc/temporary_numpy_seed.py:4-17): temporarily pin the global numpy
RNG and restore its state on exit. The device-side pipeline threads explicit
jax PRNG keys instead (SURVEY.md §7 RNG semantics); this exists for host-side
parity (deterministic split draws, synthetic data, etc.).
"""

from __future__ import annotations

import numpy as np


class TemporaryNumpySeed:
    """Context manager: save/restore the numpy global RNG around a seed.
    ``seed=None`` leaves the RNG untouched."""

    def __init__(self, seed=None):
        self.seed = seed
        self._state = None

    def __enter__(self):
        if self.seed is not None:
            self._state = np.random.get_state()
            np.random.seed(self.seed)
        return self

    def __exit__(self, *exc):
        if self._state is not None:
            np.random.set_state(self._state)
        return False


def fold_seed(*parts) -> int:
    """Derive a stable 31-bit seed from arbitrary hashable parts."""
    import zlib
    data = "|".join(str(p) for p in parts).encode()
    return zlib.crc32(data) & 0x7FFFFFFF
