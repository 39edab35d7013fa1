"""Device mesh construction + sharding rules.

The reference has no distributed support at all (SURVEY.md §2.5: no DDP, no
NCCL/MPI — single GPU). This module is new TPU-native capability: a 2-D
("data", "model") mesh over ICI with GSPMD shardings.

- Data parallelism: batches shard over "data"; XLA inserts the gradient
  psum automatically for pjit-compiled train steps.
- Tensor parallelism (useful for ViT-L/16): attention QKV + MLP fc1 shard
  their output features over "model"; out-proj + fc2 shard input features, so
  each encoder block needs exactly one all-reduce per sublayer — the
  Megatron-style layout expressed purely through sharding annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(data: int = -1, model: int = 1, seq: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a ("data", "model", "seq") mesh. data=-1 uses all remaining
    devices. ``seq`` > 1 enables sequence parallelism: the train/eval steps
    route attention through the ppermute ring (parallel/ring_attention.py)
    with the token axis sharded across that axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % (model * seq) != 0:
            raise ValueError(
                f"{n} devices not divisible by model*seq={model * seq}.")
        data = n // (model * seq)
    if data * model * seq > n:
        raise ValueError(f"Mesh {data}x{model}x{seq} needs "
                         f"{data * model * seq} devices; have {n}.")
    grid = np.asarray(devices[: data * model * seq]).reshape(data, model, seq)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def seq_size(mesh: Optional[Mesh]) -> int:
    """Size of the sequence-parallel axis (1 when absent / no mesh)."""
    if mesh is None or SEQ_AXIS not in mesh.axis_names:
        return 1
    return mesh.shape[SEQ_AXIS]


def _param_spec(path: str) -> P:
    """Partition spec for a parameter, keyed by its tree path.

    Megatron-style TP for the transformer blocks; everything else replicated.
    """
    if "attn" in path:
        if "out" in path and path.endswith("kernel"):
            return P(MODEL_AXIS, None)       # row-parallel out-proj
        if path.endswith("kernel"):
            return P(None, MODEL_AXIS)       # column-parallel QKV
        if ("query" in path or "key" in path or "value" in path) and path.endswith("bias"):
            return P(MODEL_AXIS)             # bias follows the sharded features
    if "mlp" in path or "fc1" in path or "fc2" in path:
        if "fc1" in path and path.endswith("kernel"):
            return P(None, MODEL_AXIS)
        if "fc1" in path and path.endswith("bias"):
            return P(MODEL_AXIS)
        if "fc2" in path and path.endswith("kernel"):
            return P(MODEL_AXIS, None)
    return P()  # replicated


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching ``params`` structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(_path_str(path))),
        params)


def param_specs(params):
    """Pytree of PartitionSpecs (for in_shardings= on pjit/shard_map)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _param_spec(_path_str(path)), params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data-parallel sharding for batch arrays."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh with TP/replicated layouts."""
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(batch, mesh: Mesh):
    """Place batch arrays with leading-axis data sharding."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
