"""Bidirectional parameter conversion: our JAX VTAMIQ pytree <-> the torch
reference's state dict (/root/reference modules/vtamiq/vtamiq.py).

Used by the parity harness (parity_run.py) to evaluate BOTH frameworks with
IDENTICAL weights. Layout rules (see tests/test_parity_torch.py, which this
generalizes): torch Linear kernels are (out, in) <-> ours (in, out); k=1
Conv1d kernels are (out, in, 1); the Conv2d patch embedding is OIHW
(H, 3, P, P) <-> our flattened HWIO (P*P*3, H).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from vtamiq_tpu.models.configs import VTAMIQConfig
from vtamiq_tpu.models.vtamiq import init_vtamiq_params


def _t2a(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def build_reference_model(cfg: VTAMIQConfig, pretrained: bool = False):
    """Construct the torch reference VTAMIQ matching ``cfg`` (requires
    tests/reference_shim.install_reference() to have run)."""
    import torch
    from modules.vtamiq.vtamiq import VTAMIQ

    torch.manual_seed(0)
    model = VTAMIQ(
        vit_config=dict(
            variant="ViT-B16" if cfg.vit.variant == "ViT-B16" else cfg.vit.variant,
            pretrained=pretrained,
            num_keep_layers=cfg.vit.effective_num_layers,
            num_extra_tokens=cfg.vit.num_extra_tokens,
            num_scales=cfg.vit.num_scales,
            num_adapters=cfg.vit.num_adapters,
            use_layer_scale=cfg.vit.use_layer_scale,
            path_drop_prob=cfg.vit.path_drop_prob,
        ),
        calibrate=cfg.calibrate,
        diff_scale=cfg.diff_scale,
        num_rgs=cfg.num_rgs,
        num_rcabs=cfg.num_rcabs,
        ca_reduction=cfg.ca_reduction,
        rg_path_drop=cfg.rg_path_drop,
        predictor_dropout=cfg.predictor_dropout,
    )
    model.eval()
    return model


def _pairs(cfg: VTAMIQConfig):
    """Yield (torch_key, getter(params) -> leaf-slot setter info) mappings as
    (torch_key, path, kind) where path indexes our pytree and kind encodes
    the layout transform: 'linear' (transpose), 'conv1d' ((out,in,1)),
    'vec' (flatten), 'patch_conv2d', 'scalar'."""
    h = cfg.vit.hidden_size
    yield ("transformer.embeddings.patch_embeddings.weight",
           ("vit", "embeddings", "patch", "kernel"), "patch_conv2d")
    yield ("transformer.embeddings.patch_embeddings.bias",
           ("vit", "embeddings", "patch", "bias"), "vec")
    yield ("transformer.embeddings.cls_token",
           ("vit", "embeddings", "cls_token"), "vec")
    if cfg.vit.num_extra_tokens > 0:
        yield ("transformer.embeddings.extra_tokens",
               ("vit", "embeddings", "extra_tokens"), "mat")
    yield ("transformer.embeddings.positional_embeddings.positional_embeddings",
           ("vit", "embeddings", "pos_embeddings"), "mat")
    if cfg.vit.use_scale_embedding:
        yield ("transformer.embeddings.scale_embeddings.scale_embeddings",
               ("vit", "embeddings", "scale_embeddings"), "mat")

    for i in range(cfg.vit.effective_num_layers):
        pre = f"transformer.encoder.layers.{i}"
        ours = ("vit", "encoder", "layers", f"layer_{i}")
        for name in ("query", "key", "value", "out"):
            yield (f"{pre}.attn.{name}.weight", ours + ("attn", name, "kernel"), "linear")
            yield (f"{pre}.attn.{name}.bias", ours + ("attn", name, "bias"), "vec")
        yield (f"{pre}.ffn.fc1.weight", ours + ("mlp", "fc1", "kernel"), "linear")
        yield (f"{pre}.ffn.fc1.bias", ours + ("mlp", "fc1", "bias"), "vec")
        yield (f"{pre}.ffn.fc2.weight", ours + ("mlp", "fc2", "kernel"), "linear")
        yield (f"{pre}.ffn.fc2.bias", ours + ("mlp", "fc2", "bias"), "vec")
        yield (f"{pre}.attention_norm.weight", ours + ("ln1", "scale"), "vec")
        yield (f"{pre}.attention_norm.bias", ours + ("ln1", "bias"), "vec")
        yield (f"{pre}.ffn_norm.weight", ours + ("ln2", "scale"), "vec")
        yield (f"{pre}.ffn_norm.bias", ours + ("ln2", "bias"), "vec")
        if cfg.vit.use_layer_scale:
            yield (f"{pre}.ls1.gamma", ours + ("ls1",), "vec")
            yield (f"{pre}.ls2.gamma", ours + ("ls2",), "vec")

    yield ("transformer.encoder.encoder_norm.weight",
           ("vit", "encoder", "final_ln", "scale"), "vec")
    yield ("transformer.encoder.encoder_norm.bias",
           ("vit", "encoder", "final_ln", "bias"), "vec")

    if cfg.diff_scale:
        yield ("diff_scale.gamma", ("diff_scale",), "vec")

    if cfg.calibrate:
        for g in range(cfg.num_rgs):
            rg = ("quality_decoder", "rgs", f"rg_{g}")
            for r in range(cfg.num_rcabs):
                pre = f"quality_decoder.{g}.body.{r}.body"
                rcab = rg + ("rcabs", f"rcab_{r}")
                yield (f"{pre}.1.weight", rcab + ("prelu",), "scalar")
                yield (f"{pre}.2.weight", rcab + ("conv", "kernel"), "conv1d")
                yield (f"{pre}.2.bias", rcab + ("conv", "bias"), "vec")
                yield (f"{pre}.4.conv_du.1.weight", rcab + ("ca", "down", "kernel"), "conv1d")
                yield (f"{pre}.4.conv_du.1.bias", rcab + ("ca", "down", "bias"), "vec")
                yield (f"{pre}.4.conv_du.4.weight", rcab + ("ca", "up", "kernel"), "conv1d")
                yield (f"{pre}.4.conv_du.4.bias", rcab + ("ca", "up", "bias"), "vec")
            yield (f"quality_decoder.{g}.body.{cfg.num_rcabs}.weight",
                   rg + ("conv", "kernel"), "conv1d")
            yield (f"quality_decoder.{g}.body.{cfg.num_rcabs}.bias",
                   rg + ("conv", "bias"), "vec")
        yield (f"quality_decoder.{cfg.num_rgs}.weight",
               ("quality_decoder", "conv", "kernel"), "conv1d")
        yield (f"quality_decoder.{cfg.num_rgs}.bias",
               ("quality_decoder", "conv", "bias"), "vec")

    yield ("q_predictor.1.weight", ("q_predictor", "fc1", "kernel"), "linear")
    yield ("q_predictor.1.bias", ("q_predictor", "fc1", "bias"), "vec")
    yield ("q_predictor.2.weight", ("q_predictor", "prelu"), "scalar")
    yield ("q_predictor.4.weight", ("q_predictor", "fc2", "kernel"), "linear")
    yield ("q_predictor.4.bias", ("q_predictor", "fc2", "bias"), "vec")


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree[p]
    tree[path[-1]] = value


def torch_to_jax(model, cfg: VTAMIQConfig):
    """Torch reference state dict -> our param pytree."""
    sd = {k: _t2a(v) for k, v in model.state_dict().items()}
    h = cfg.vit.hidden_size
    params = init_vtamiq_params(jax.random.PRNGKey(0), cfg)
    for tkey, path, kind in _pairs(cfg):
        a = sd[tkey]
        if kind == "linear":
            v = jnp.asarray(a.T)
        elif kind == "conv1d":
            v = jnp.asarray(a[:, :, 0].T)
        elif kind == "patch_conv2d":
            v = jnp.asarray(a.transpose(2, 3, 1, 0).reshape(-1, h))
        elif kind == "vec":
            v = jnp.asarray(a.reshape(_get(params, path).shape))
        elif kind == "mat":
            v = jnp.asarray(a.reshape(_get(params, path).shape))
        elif kind == "scalar":
            v = jnp.asarray(a.reshape(()))
        else:
            raise ValueError(kind)
        _set(params, path, v)
    return params


def jax_to_torch(params, model, cfg: VTAMIQConfig):
    """Our param pytree -> loaded into the torch reference model (in place)."""
    import torch
    sd = model.state_dict()
    h = cfg.vit.hidden_size
    for tkey, path, kind in _pairs(cfg):
        a = np.asarray(_get(params, path), dtype=np.float32)
        tshape = tuple(sd[tkey].shape)
        if kind == "linear":
            v = a.T
        elif kind == "conv1d":
            v = a.T[:, :, None]
        elif kind == "patch_conv2d":
            p = cfg.vit.patch_size
            v = a.reshape(p, p, 3, h).transpose(3, 2, 0, 1)
        else:
            v = a.reshape(tshape)
        sd[tkey] = torch.from_numpy(np.ascontiguousarray(v.reshape(tshape)))
    model.load_state_dict(sd)
    return model
