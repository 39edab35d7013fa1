"""Build the native image-IO library (g++ -> libvtamiq_io.so).

Called lazily by vtamiq_tpu.data.native_io on first use; safe to run
standalone: ``python -m vtamiq_tpu.native.build``.
"""

from __future__ import annotations

import os
import subprocess
import sys

NATIVE_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(NATIVE_DIR, "image_io.cpp")
LIB = os.path.join(NATIVE_DIR, "libvtamiq_io.so")


def build(force: bool = False) -> str:
    """Compile the shared library if missing/stale; returns its path."""
    if (not force and os.path.isfile(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        SRC, "-o", LIB, "-ljpeg", "-lpng", "-lz", "-lpthread",
    ]
    result = subprocess.run(cmd, capture_output=True, text=True)
    if result.returncode != 0:
        raise RuntimeError(
            f"native image_io build failed:\n{result.stderr[:4000]}")
    return LIB


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
