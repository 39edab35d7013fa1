"""Model introspection: parameter tables, FLOP estimates, pytree helpers.

Capability parity with the reference's modules/utils.py (print_parameters
L55-65, count_parameters, print_flops via thop L68-78, save_model_params
L44, tensor debug helpers). FLOPs here are computed analytically from the
architecture (no tracing dependency like thop), using the same reference
input convention: 1 pair x 500 patches x 3x16x16 (modules/utils.py:68-78).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import numpy as np

from .configs import VTAMIQConfig, ViTConfig


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return ".".join(parts)


def count_parameters(params) -> int:
    return int(sum(np.prod(np.shape(leaf))
                   for leaf in jax.tree_util.tree_leaves(params)))


def parameter_table(params, max_rows: Optional[int] = None) -> List[Tuple[str, tuple, int]]:
    rows = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        shape = tuple(np.shape(leaf))
        rows.append((_path_str(path), shape, int(np.prod(shape)) if shape else 1))
    if max_rows is not None:
        rows = rows[:max_rows]
    return rows


def print_parameters(params, full: bool = False, log=print):
    total = count_parameters(params)
    if full:
        try:
            import tabulate
            rows = parameter_table(params)
            log(tabulate.tabulate(rows, headers=["parameter", "shape", "count"]))
        except ImportError:  # pragma: no cover
            for name, shape, count in parameter_table(params):
                log(f"{name:80s} {str(shape):24s} {count}")
    log(f"Total parameters: {total:,} ({total / 1e6:.2f}M)")
    return total


def save_model_params(params, output_dir: str, filename: str = "model_params.txt"):
    import os
    os.makedirs(output_dir, exist_ok=True)
    lines = [f"{name}\t{shape}\t{count}"
             for name, shape, count in parameter_table(params)]
    lines.append(f"TOTAL\t\t{count_parameters(params)}")
    with open(os.path.join(output_dir, filename), "w") as f:
        f.write("\n".join(lines))


# --------------------------------------------------------------------------
# analytic FLOP model
# --------------------------------------------------------------------------

def vit_flops(cfg: ViTConfig, num_patches: int) -> int:
    """Forward-pass FLOPs (multiply-accumulate counted as 2) for one image's
    patch sequence through the ViT."""
    h = cfg.hidden_size
    m = cfg.mlp_dim
    s = cfg.num_tokens + num_patches
    layers = cfg.effective_num_layers

    embed = 2 * num_patches * (cfg.patch_size ** 2 * 3) * h
    per_layer = (
        2 * s * h * h * 4          # QKV + out projections
        + 2 * s * s * h * 2        # QK^T and PV
        + 2 * s * h * m * 2        # MLP fc1 + fc2
    )
    return embed + layers * per_layer


def vtamiq_flops(cfg: VTAMIQConfig, num_patches: int = 500) -> int:
    """Dual-tower forward FLOPs for one ref/dist pair at the reference's
    FLOP-count input convention (1 x num_patches x 3x16x16)."""
    h = cfg.vit.hidden_size
    towers = 2 * vit_flops(cfg.vit, num_patches)
    rcab = 2 * h * h + 2 * h * (h // cfg.ca_reduction) * 2   # conv + CA gate
    decoder = cfg.num_rgs * (cfg.num_rcabs * rcab + 2 * h * h) + 2 * h * h
    predictor = 2 * h * (h // 4) + 2 * (h // 4)
    return towers + decoder + predictor


def print_flops(cfg: VTAMIQConfig, num_patches: int = 500, log=print) -> int:
    flops = vtamiq_flops(cfg, num_patches)
    log(f"VTAMIQ forward FLOPs (1 pair x {num_patches} patches x 3x"
        f"{cfg.vit.patch_size}x{cfg.vit.patch_size}): {flops / 1e9:.2f} GFLOPs")
    return flops


# --------------------------------------------------------------------------
# tensor debug helpers (reference tinfo/ainfo)
# --------------------------------------------------------------------------

def tinfo(tag: str, t, log=print):
    a = np.asarray(t)
    log(f"tinfo: {tag} {a.shape} {a.min():.5g} {a.mean():.5g} {a.max():.5g}")


ainfo = tinfo
