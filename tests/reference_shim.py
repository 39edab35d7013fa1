"""Helper to import the upstream reference (read-only at /root/reference) for
golden-parity tests.

The image lacks ``timm``/``skimage``/``thop``; this installs minimal stand-ins
for the handful of symbols the reference imports, then puts the reference on
sys.path. Used only by tests — never by the framework itself.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def install_reference(path: str = REFERENCE_PATH) -> bool:
    try:
        import torch
        import torch.nn as nn
    except Exception:
        return False

    if "timm" not in sys.modules:
        class DropPath(nn.Module):
            def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
                super().__init__()
                self.drop_prob = drop_prob
                self.scale_by_keep = scale_by_keep

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
                if self.scale_by_keep:
                    mask = mask / keep
                return x * mask

        def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
            with torch.no_grad():
                tensor.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
            return tensor

        timm = types.ModuleType("timm")
        timm_models = types.ModuleType("timm.models")
        timm_models_layers = types.ModuleType("timm.models.layers")
        timm_layers = types.ModuleType("timm.layers")
        for mod in (timm_models_layers, timm_layers):
            mod.DropPath = DropPath
            mod.trunc_normal_ = trunc_normal_
        timm.models = timm_models
        timm.layers = timm_layers
        timm_models.layers = timm_models_layers
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = timm_models
        sys.modules["timm.models.layers"] = timm_models_layers
        sys.modules["timm.layers"] = timm_layers

    if "skimage" not in sys.modules:
        # minimal stand-in for skimage.util.shape.view_as_windows
        import numpy as np

        def view_as_windows(arr, window_shape, step):
            if isinstance(window_shape, int):
                window_shape = (window_shape,) * arr.ndim
            if isinstance(step, int):
                step = (step,) * arr.ndim
            out_shape = tuple((s - w) // st + 1
                              for s, w, st in zip(arr.shape, window_shape, step))
            strides = tuple(s * st for s, st in zip(arr.strides, step)) + arr.strides
            return np.lib.stride_tricks.as_strided(
                arr, shape=out_shape + tuple(window_shape), strides=strides,
                writeable=False)

        skimage = types.ModuleType("skimage")
        skimage_util = types.ModuleType("skimage.util")
        skimage_util_shape = types.ModuleType("skimage.util.shape")
        skimage_util_shape.view_as_windows = view_as_windows
        skimage.util = skimage_util
        skimage_util.shape = skimage_util_shape
        sys.modules["skimage"] = skimage
        sys.modules["skimage.util"] = skimage_util
        sys.modules["skimage.util.shape"] = skimage_util_shape

    if "torchvision" not in sys.modules:
        # functional stand-in: the parity harness drives the reference's FULL
        # data path (data/utils.py transform_img), so to_tensor/crop/flip/
        # grayscale/normalize must be real, torchvision-exact implementations
        import numpy as _np
        import torch as _torch

        tv = types.ModuleType("torchvision")
        tv_transforms = types.ModuleType("torchvision.transforms")
        tv_functional = types.ModuleType("torchvision.transforms.functional")
        tv_models = types.ModuleType("torchvision.models")

        def _to_tensor(img):
            arr = _np.asarray(img)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            t = _torch.from_numpy(_np.ascontiguousarray(arr.transpose(2, 0, 1)))
            if t.dtype == _torch.uint8:
                return t.float().div(255.0)
            return t.float()

        def _crop(tensor, i, j, h, w):
            return tensor[..., i:i + h, j:j + w]

        def _hflip(tensor):
            return tensor.flip(-1)

        def _vflip(tensor):
            return tensor.flip(-2)

        def _rgb_to_grayscale(tensor, num_output_channels=1):
            r, g, b = tensor.unbind(dim=-3)
            l = (0.2989 * r + 0.587 * g + 0.114 * b).to(tensor.dtype)
            l = l.unsqueeze(dim=-3)
            if num_output_channels == 3:
                l = l.expand(*tensor.shape[:-3], 3, *tensor.shape[-2:])
            return l

        def _normalize(tensor, mean, std, inplace=False):
            mean = _torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
            std = _torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
            return (tensor - mean) / std

        tv_functional.to_tensor = _to_tensor
        tv_functional.crop = _crop
        tv_functional.hflip = _hflip
        tv_functional.vflip = _vflip
        tv_functional.rgb_to_grayscale = _rgb_to_grayscale
        tv_functional.normalize = _normalize

        class _VGG16Weights:
            class IMAGENET1K_V1:
                @staticmethod
                def transforms():
                    class T:
                        mean = [0.485, 0.456, 0.406]
                        std = [0.229, 0.224, 0.225]
                    return T()

        tv_models.VGG16_Weights = _VGG16Weights
        tv.transforms = tv_transforms
        tv.models = tv_models
        tv_transforms.functional = tv_functional
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv_transforms
        sys.modules["torchvision.transforms.functional"] = tv_functional
        sys.modules["torchvision.models"] = tv_models

    if path not in sys.path:
        sys.path.insert(0, path)
    return True


def reference_available() -> bool:
    import os
    return os.path.isdir(REFERENCE_PATH)
