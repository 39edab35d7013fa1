"""ctypes bindings for the native C++ image decoder (vtamiq_tpu/native/).

Drop-in fast path for the host input pipeline: decodes BMP/JPEG/PNG straight
into float32 HWC numpy buffers with fused flip + normalization, and a
threaded batch decoder. Falls back to the PIL path (data.imageio) when the
toolchain or codec libraries are unavailable — the framework never hard-
depends on the native library.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ..utils import log_warn

_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        from ..native.build import build
        path = build()
        lib = ctypes.CDLL(path)
        lib.vtamiq_image_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.vtamiq_image_size.restype = ctypes.c_int
        lib.vtamiq_decode_rgb_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        lib.vtamiq_decode_rgb_f32.restype = ctypes.c_int
        lib.vtamiq_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int]
        lib.vtamiq_decode_batch.restype = ctypes.c_int
        _lib = lib
    except Exception as e:  # toolchain/codec unavailable -> PIL fallback
        log_warn(f"native image IO unavailable ({e}); falling back to PIL.")
        _lib_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _fptr(arr: Optional[np.ndarray]):
    if arr is None:
        return None
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def image_size(path: str) -> Tuple[int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native image IO unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.vtamiq_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"vtamiq_image_size failed ({rc}) for [{path}]")
    return h.value, w.value


def decode_rgb(path: str, h: Optional[int] = None, w: Optional[int] = None,
               h_flip: bool = False, v_flip: bool = False,
               norm_mean=None, norm_std=None) -> np.ndarray:
    """Decode one image to float32 (h, w, 3); [0,1] or normalized."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image IO unavailable")
    if h is None or w is None:
        h, w = image_size(path)
    out = np.empty((h, w, 3), np.float32)
    mean = np.asarray(norm_mean, np.float32) if norm_mean is not None else None
    std = np.asarray(norm_std, np.float32) if norm_std is not None else None
    rc = lib.vtamiq_decode_rgb_f32(path.encode(), _fptr(out), h, w,
                                   int(h_flip), int(v_flip), _fptr(mean), _fptr(std))
    if rc != 0:
        raise IOError(f"vtamiq_decode_rgb_f32 failed ({rc}) for [{path}]")
    return out


def decode_batch(paths: Sequence[str], sizes: Sequence[Tuple[int, int]],
                 h_flips: Optional[Sequence[bool]] = None,
                 v_flips: Optional[Sequence[bool]] = None,
                 norm_mean=None, norm_std=None,
                 num_threads: int = 0) -> list:
    """Decode many images in parallel (C++ thread pool). Returns a list of
    float32 (h, w, 3) arrays in input order."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native image IO unavailable")
    n = len(paths)
    outs = [np.empty((h, w, 3), np.float32) for h, w in sizes]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(*[_fptr(o) for o in outs])
    c_hs = (ctypes.c_int * n)(*[s[0] for s in sizes])
    c_ws = (ctypes.c_int * n)(*[s[1] for s in sizes])
    c_hf = (ctypes.c_int * n)(*[int(b) for b in (h_flips or [0] * n)])
    c_vf = (ctypes.c_int * n)(*[int(b) for b in (v_flips or [0] * n)])
    mean = np.asarray(norm_mean, np.float32) if norm_mean is not None else None
    std = np.asarray(norm_std, np.float32) if norm_std is not None else None
    if num_threads <= 0:
        num_threads = max(1, (os.cpu_count() or 1) - 1)
    failures = lib.vtamiq_decode_batch(c_paths, n, c_outs, c_hs, c_ws, c_hf,
                                       c_vf, _fptr(mean), _fptr(std), num_threads)
    if failures:
        raise IOError(f"vtamiq_decode_batch: {failures}/{n} decodes failed")
    return outs
