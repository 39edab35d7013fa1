"""Model configurations: ViT variants + VTAMIQ head.

Variant definitions mirror the reference's get_B16/B8/L16_config
(modules/VisionTransformer/transformer.py:68-111); the VTAMIQ head defaults
mirror vtamiq_config (train_config.py:181-194) and vit_config
(train_config.py:169-179).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

VIT_VARIANT_B8 = "ViT-B8"
VIT_VARIANT_B16 = "ViT-B16"
VIT_VARIANT_L16 = "ViT-L16"

DROPOUT_MLP = 0.0
DROPOUT_ATTN = 0.0
DROPOUT_PROJ = 0.0
DROPOUT_EMBEDDINGS = 0.0
INIT_NORM_STD = 0.02


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """Architecture + feature switches for the sparse-patch ViT backbone."""

    variant: str = VIT_VARIANT_B16
    img_dim: int = 384
    patch_size: int = 16
    hidden_size: int = 768
    mlp_dim: int = 3072
    num_heads: int = 12
    num_layers: int = 12          # layers available in the variant/weights
    num_keep_layers: int = 6      # encoder truncation; -1 keeps all
    num_extra_tokens: int = 8     # "register" tokens after CLS
    num_scales: int = 0           # <2 disables the scale embedding
    num_adapters: int = 0         # Houlsby adapters per layer (0 = off)
    use_cls_token: bool = True
    use_patch_embedding: bool = True
    use_pos_embedding: bool = True
    use_layer_scale: bool = True
    path_drop_prob: float = 0.1   # NOTE: the reference constructs DropPath()
    # without this prob (transformer.py:272-273), so its encoder drop-path is
    # effectively 0.0; `vit_path_drop_active` preserves that behavior by
    # default while allowing the documented behavior to be switched on.
    vit_path_drop_active: bool = False
    attn_logits_fp32: bool = False  # force fp32 storage of attention logits
    # even in bf16 compute; off by default — bf16 logits halve the dominant
    # HBM traffic of the short-sequence forward (+10% on v5e; the reference's
    # fp16 autocast also stores half-precision logits, train.py:514)
    remat: bool = False          # jax.checkpoint each encoder layer: trades
    # recompute FLOPs for activation memory (long patch sequences / training)
    vit_weights_path: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def effective_num_layers(self) -> int:
        if self.num_keep_layers > 0:
            return max(1, min(self.num_keep_layers, self.num_layers))
        return self.num_layers

    @property
    def num_tokens(self) -> int:
        return int(self.use_cls_token) + self.num_extra_tokens

    @property
    def use_scale_embedding(self) -> bool:
        return self.num_scales > 1

    @property
    def pos_grid(self) -> int:
        return self.img_dim // self.patch_size  # 24 for B16 @ 384


def get_vit_config(variant: str = VIT_VARIANT_B16, **overrides) -> ViTConfig:
    if variant in ("B8", "B16", "L16"):  # accept the bare CLI short form
        variant = f"ViT-{variant}"
    if variant == VIT_VARIANT_B16:
        base = dict(patch_size=16, hidden_size=768, mlp_dim=3072, num_heads=12, num_layers=12)
    elif variant == VIT_VARIANT_B8:
        base = dict(patch_size=8, hidden_size=768, mlp_dim=3072, num_heads=12, num_layers=12)
    elif variant == VIT_VARIANT_L16:
        base = dict(patch_size=16, hidden_size=1024, mlp_dim=4096, num_heads=16, num_layers=24)
    else:
        raise ValueError(f"ViT: unsupported variant [{variant}]; pick from "
                         f"{[VIT_VARIANT_B8, VIT_VARIANT_B16, VIT_VARIANT_L16]}")
    base.update(overrides)
    return ViTConfig(variant=variant, **base)


@dataclasses.dataclass(frozen=True)
class VTAMIQConfig:
    """VTAMIQ head configuration (reference: vtamiq.py:26-77 + train_config)."""

    vit: ViTConfig = dataclasses.field(default_factory=get_vit_config)
    calibrate: bool = True       # apply DiffNet to the CLS difference
    diff_scale: bool = True      # LayerScale on the difference vector
    num_rgs: int = 4             # ResidualGroups in DiffNet
    num_rcabs: int = 4           # RCABs per ResidualGroup
    ca_reduction: int = 16       # channel reduction in CALayer
    rg_path_drop: float = 0.1    # DropPath on RG residuals (active, unlike ViT)
    predictor_dropout: float = 0.1
    token_num: int = 0           # which token feeds the head (0 = CLS)
    use_ms_cam: bool = False     # MS-CAM channel attention instead of CALayer
    use_local: bool = False      # enable the local branch in MS-CAM/AFF
