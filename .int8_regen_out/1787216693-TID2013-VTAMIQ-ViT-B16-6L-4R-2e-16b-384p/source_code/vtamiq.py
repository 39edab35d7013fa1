"""VTAMIQ: dual-tower FR-IQA model = ViT encoder + DiffNet + quality MLP.

Capability parity with the reference VTAMIQ (modules/vtamiq/vtamiq.py:26-119)
and the RCAN-style DiffNet (modules/RCAN/channel_attention.py), redesigned
TPU-first:

- The two towers (reference image, distorted image) run as ONE program: the
  (B, 2, N, ...) input folds the tower axis into the batch, so one encoder
  forward of shape (2B, S, H) keeps the MXU at full occupancy instead of two
  half-size passes (reference runs forward_vit twice, vtamiq.py:100-101).
- The reference's DiffNet operates on a (B, 768, 1) "sequence" with 1x1
  Conv1d + AdaptiveAvgPool1d(1); over a length-1 axis every one of those is
  exactly a dense layer on (B, 768), so DiffNet here is an MLP/sigmoid-gate
  stack XLA fuses into a few MXU/VPU ops.

Quirks preserved: PReLU layers use a single shared slope parameter (torch
nn.PReLU() default, init 0.25); DiffNet residual-group DropPath IS active at
rg_path_drop (channel_attention.py:26-29), unlike the inert encoder DropPath.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .configs import VTAMIQConfig
from .vit import (
    init_vit_params, vit_forward, dense, drop_path, _linear_init,
)


# --------------------------------------------------------------------------
# initialization
# --------------------------------------------------------------------------

def _prelu_init():
    return jnp.asarray(0.25, jnp.float32)  # torch nn.PReLU() default


def init_calayer(key, dim: int, reduction: int) -> Dict:
    """Channel-attention gate: dim -> dim/r -> ReLU -> dim -> sigmoid
    (channel_attention.py:69-86)."""
    hidden = dim // reduction
    k1, k2 = jax.random.split(key)
    return {"down": _linear_init(k1, dim, hidden), "up": _linear_init(k2, hidden, dim)}


def init_ms_cam(key, dim: int, reduction: int, use_local: bool) -> Dict:
    """MS-CAM: global (pooled) + optional local channel-attention branches
    (channel_attention.py:96-126, AFF/MS_CAM). Over a length-1 feature
    sequence the pool is the identity, so both branches are dense stacks."""
    k1, k2 = jax.random.split(key)
    params = {"global": init_calayer(k1, dim, reduction)}
    if use_local:
        params["local"] = init_calayer(k2, dim, reduction)
    return params


def init_rcab(key, dim: int, reduction: int, use_ms_cam: bool = False,
              use_local: bool = False) -> Dict:
    """Residual channel-attention block: x + CA(conv(PReLU(x)))
    (channel_attention.py:34-50, use_bn=False, input1d). ChannelAttn is
    CALayer by default, MS-CAM when use_ms_cam (channel_attention.py:40)."""
    k1, k2 = jax.random.split(key)
    params = {
        "prelu": _prelu_init(),
        "conv": _linear_init(k1, dim, dim),
    }
    if use_ms_cam:
        params["ms_cam"] = init_ms_cam(k2, dim, reduction, use_local)
    else:
        params["ca"] = init_calayer(k2, dim, reduction)
    return params


def init_residual_group(key, dim: int, num_rcabs: int, reduction: int,
                        use_ms_cam: bool = False, use_local: bool = False) -> Dict:
    keys = jax.random.split(key, num_rcabs + 1)
    return {
        "rcabs": {f"rcab_{i}": init_rcab(keys[i], dim, reduction, use_ms_cam, use_local)
                  for i in range(num_rcabs)},
        "conv": _linear_init(keys[-1], dim, dim),
    }


def init_aff(key, dim: int, reduction: int = 2, use_local: bool = True) -> Dict:
    """Attentional Feature Fusion (channel_attention.py:96-114)."""
    return init_ms_cam(key, dim, reduction, use_local)


def init_iaff(key, dim: int, reduction: int = 2, use_local: bool = True) -> Dict:
    """Iterative AFF (channel_attention.py:131-142)."""
    k1, k2 = jax.random.split(key)
    return {"aff": init_aff(k1, dim, reduction, use_local),
            "ms_cam": init_ms_cam(k2, dim, reduction, use_local)}


def init_vtamiq_params(key, cfg: VTAMIQConfig) -> Dict:
    h = cfg.vit.hidden_size
    keys = jax.random.split(key, 6 + cfg.num_rgs)
    params: Dict = {"vit": init_vit_params(keys[0], cfg.vit)}

    if cfg.diff_scale:
        params["diff_scale"] = jnp.ones((h,), jnp.float32)  # LayerScale init 1.0

    if cfg.calibrate:
        params["quality_decoder"] = {
            "rgs": {
                f"rg_{i}": init_residual_group(keys[1 + i], h, cfg.num_rcabs,
                                               cfg.ca_reduction, cfg.use_ms_cam,
                                               cfg.use_local)
                for i in range(cfg.num_rgs)
            },
            "conv": _linear_init(keys[1 + cfg.num_rgs], h, h),
        }

    params["q_predictor"] = {
        "fc1": _linear_init(keys[-2], h, h // 4),
        "prelu": _prelu_init(),
        "fc2": _linear_init(keys[-1], h // 4, 1),
    }
    return params


# --------------------------------------------------------------------------
# forward blocks
# --------------------------------------------------------------------------

def prelu(alpha, x):
    return jnp.where(x >= 0, x, alpha * x)


def calayer(params, x):
    """x * sigmoid(up(relu(down(x)))) over feature axis (B, H)."""
    w = dense(params["up"], jax.nn.relu(dense(params["down"], x)))
    return x * jax.nn.sigmoid(w)


def _branch(params, x):
    return dense(params["up"], jax.nn.relu(dense(params["down"], x)))


def ms_cam_weight(params, x):
    """MS-CAM attention weight: sigmoid(local(x) + global(x))
    (channel_attention.py:121-126)."""
    w = _branch(params["global"], x)
    if "local" in params:
        w = w + _branch(params["local"], x)
    return jax.nn.sigmoid(w)


def ms_cam(params, x):
    return x * ms_cam_weight(params, x)


def aff(params, x, y):
    """Attentional Feature Fusion: lerp(x, y, w(x+y))
    (channel_attention.py:109-114)."""
    w = ms_cam_weight(params, x + y)
    return x + w * (y - x)


def iaff(params, x, y):
    """Iterative AFF: fuse, re-weight, lerp (channel_attention.py:137-142)."""
    xi = aff(params["aff"], x, y)
    w = ms_cam_weight(params["ms_cam"], xi)
    return x + w * (y - x)


def rcab(params, x):
    h = prelu(params["prelu"].astype(x.dtype), x)
    h = dense(params["conv"], h)
    if "ms_cam" in params:
        return x + ms_cam(params["ms_cam"], h)
    return x + calayer(params["ca"], h)


def residual_group(params, x, path_drop_prob: float, train: bool,
                   rng: Optional[jax.Array]):
    h = x
    for name in sorted(params["rcabs"].keys(), key=lambda s: int(s.split("_")[1])):
        h = rcab(params["rcabs"][name], h)
    h = dense(params["conv"], h)
    if train and path_drop_prob > 0.0 and rng is not None:
        h = drop_path(rng, h, path_drop_prob)
    return x + h


def quality_decoder(params, x, cfg: VTAMIQConfig, train: bool,
                    rng: Optional[jax.Array]):
    """DiffNet: num_rgs ResidualGroups + output dense
    (vtamiq.py:12-23 get_quality_decoder)."""
    rg_names = sorted(params["rgs"].keys(), key=lambda s: int(s.split("_")[1]))
    for name in rg_names:
        sub = None
        if rng is not None:
            rng, sub = jax.random.split(rng)
        x = residual_group(params["rgs"][name], x, cfg.rg_path_drop, train, sub)
    return dense(params["conv"], x)


def q_predictor(params, x, dropout: float, train: bool, rng: Optional[jax.Array]):
    """Dropout -> H -> H/4 -> PReLU -> Dropout -> 1 (vtamiq.py:71-77)."""
    def maybe_dropout(key, h):
        if train and dropout > 0.0 and key is not None:
            keep = 1.0 - dropout
            mask = jax.random.bernoulli(key, keep, h.shape)
            return jnp.where(mask, h / keep, 0.0)
        return h

    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)
    x = maybe_dropout(k1, x)
    x = dense(params["fc1"], x)
    x = prelu(params["prelu"].astype(x.dtype), x)
    x = maybe_dropout(k2, x)
    return dense(params["fc2"], x)


# --------------------------------------------------------------------------
# full model
# --------------------------------------------------------------------------

def vtamiq_forward(params, cfg: VTAMIQConfig, patches, pos, scales=None, *,
                   train: bool = False, rng: Optional[jax.Array] = None,
                   patch_mask: Optional[jnp.ndarray] = None,
                   compute_dtype=jnp.bfloat16,
                   adapter_num: Optional[int] = None,
                   attention_fn=None) -> jnp.ndarray:
    """Predict quality scores for batched (ref, dist) patch pairs.

    Args:
      patches: (B, 2, N, P, P, 3) — axis 1 is (reference, distorted).
      pos: (B, 2, N, 2) uv centers; scales: optional (B, 2, N) ints.
      patch_mask: optional (B, 2, N) bool validity.
      adapter_num: Houlsby adapter index; None (default) auto-selects
        adapter 0 whenever the ViT has adapters, matching the reference's
        forward_vit default (backbone.py:54-57). Pass -1 to force them off.

    Returns q: (B,) fp32 quality scores (reference VTAMIQ.forward,
    vtamiq.py:94-119).
    """
    b, k, n = patches.shape[0], patches.shape[1], patches.shape[2]
    if k != 2:
        raise ValueError(f"vtamiq_forward expects 2 towers (ref, dist); got {k}.")

    rng_vit = rng_qd = rng_qp = None
    if rng is not None:
        rng_vit, rng_qd, rng_qp = jax.random.split(rng, 3)

    # fold the tower axis into batch -> one encoder program of batch 2B
    flat_patches = patches.reshape((b * k,) + patches.shape[2:])
    flat_pos = pos.reshape(b * k, n, 2)
    flat_scales = scales.reshape(b * k, n) if scales is not None else None
    flat_mask = patch_mask.reshape(b * k, n) if patch_mask is not None else None

    if adapter_num is None:
        adapter_num = 0 if cfg.vit.num_adapters > 0 else -1

    feats = vit_forward(
        params["vit"], cfg.vit, flat_patches, flat_pos, flat_scales,
        tokens_only=True, train=train, rng=rng_vit, patch_mask=flat_mask,
        adapter_num=adapter_num,
        compute_dtype=compute_dtype, attention_fn=attention_fn)  # (2B, T, H)

    feats = feats.reshape(b, k, cfg.vit.num_tokens, cfg.vit.hidden_size)
    cls_ref = feats[:, 0, cfg.token_num]   # (B, H)
    cls_dist = feats[:, 1, cfg.token_num]

    # NOTE: vit_forward returns fp32 tokens (vit.py final cast), so the
    # tower difference below and the whole DiffNet/q head run in fp32 even
    # when the backbone computes in bf16 — the cancellation-sensitive
    # cls_ref - cls_dist must never be demoted to bf16 (adjudicated by the
    # round-5 collapse diagnosis: tools/diag_collapse.py).
    cls_diff = cls_ref - cls_dist
    if cfg.diff_scale:
        cls_diff = cls_diff * params["diff_scale"]

    if cfg.calibrate:
        cls_diff = quality_decoder(params["quality_decoder"], cls_diff, cfg,
                                   train, rng_qd)

    q = q_predictor(params["q_predictor"], cls_diff, cfg.predictor_dropout,
                    train, rng_qp)
    return q.reshape(b)


def vtamiq_forward_single_tower(params, cfg: VTAMIQConfig, patches, pos,
                                scales=None, **kwargs) -> jnp.ndarray:
    """Convenience wrapper scoring a single (ref, dist) pair given unbatched
    (2, N, ...) inputs — the run_custom "score one pair" path."""
    patches = patches[None]
    pos = pos[None]
    scales = scales[None] if scales is not None else None
    return vtamiq_forward(params, cfg, patches, pos, scales, **kwargs)[0]
