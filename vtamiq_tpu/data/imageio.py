"""Host-side image decode + preprocessing (numpy, channels-last).

Capability parity with the reference's ``data/utils.py`` (imread L40-47,
transform_img L50-96), torch-free: the TPU pipeline wants plain float32
HWC numpy arrays; flips/normalization are cheap host memory ops, while
patch sampling/extraction happen on device (vtamiq_tpu.ops).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image

# imagenet normalization constants (torchvision's VGG16 transform params,
# reference data/utils.py:16-19)
IMAGENET_NORM_MEAN = (0.485, 0.456, 0.406)
IMAGENET_NORM_STD = (0.229, 0.224, 0.225)
DEFAULT_NORM_MEAN = (0.5, 0.5, 0.5)
DEFAULT_NORM_STD = (0.5, 0.5, 0.5)


def imread(path: str, is_hdr: bool = False, use_native: bool = True) -> np.ndarray:
    """Read an image as float32 HWC RGB in [0,1] (or raw floats for HDR EXR).

    Prefers the native C++ decoder (vtamiq_tpu/native — BMP/JPEG/PNG,
    bit-exact vs PIL, several times faster); transparently falls back to PIL.
    """
    if is_hdr:
        os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
        import cv2
        img = cv2.imread(path, flags=cv2.IMREAD_COLOR | cv2.IMREAD_ANYDEPTH)
        if img is None:
            raise IOError(f"imread: failed to read HDR image [{path}]")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
    if use_native:
        try:
            from . import native_io
            if native_io.available():
                return native_io.decode_rgb(path)
        except Exception:
            pass  # unsupported codec/format -> PIL below
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.float32) / 255.0


def transform_img(
    img: np.ndarray,
    crop_params: Optional[Tuple[int, int, int, int]] = None,
    h_flip: bool = False,
    v_flip: bool = False,
    norm_mean: Optional[Tuple[float, float, float]] = None,
    norm_std: Optional[Tuple[float, float, float]] = None,
    grayscale: bool = False,
) -> np.ndarray:
    """Crop / flip / grayscale / normalize a float32 HWC image.

    Matches the reference transform_img semantics (data/utils.py:50-96);
    flips are 'horizontal' = left-right, 'vertical' = up-down.
    """
    out = img
    if crop_params is not None:
        i, j, h, w = crop_params
        out = out[i:i + h, j:j + w]
    if h_flip:
        out = out[:, ::-1]
    if v_flip:
        out = out[::-1, :]
    if grayscale:
        lum = (0.2989 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2])
        out = np.stack([lum, lum, lum], axis=-1)
    if norm_mean is not None and norm_std is not None:
        out = (out - np.asarray(norm_mean, np.float32)) / np.asarray(norm_std, np.float32)
    return np.ascontiguousarray(out, dtype=np.float32)
