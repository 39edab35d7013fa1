"""Multi-host (multi-process) data parallelism.

SURVEY.md §2.5 obligation: "multi-host via jax.distributed; DCN only for
multi-slice". The reference has no distributed training at all; this module
is new TPU-native capability:

- :func:`initialize` wires ``jax.distributed`` (coordinator + process id),
  after which ``jax.devices()`` spans every host's chips and a single jitted
  GSPMD program runs SPMD across them (gradient psums ride ICI within a
  slice, DCN across slices — XLA picks per the mesh layout).
- The input pipeline shards BY PROCESS in LOCKSTEP: every host's loader
  derives the SAME global batch schedule (permutation, flips, bucket
  grouping) from (seed, epoch) and decodes only its contiguous slice of
  each global batch (:class:`~vtamiq_tpu.data.pipeline.PatchDatasetLoader`
  ``process_index`` / ``process_count``). A plain strided slice is NOT
  equivalent — bucket composition and partial batches would diverge across
  hosts and deadlock the global step's collectives.
- :func:`global_batch` assembles the logical global batch from each
  process's local arrays via ``jax.make_array_from_process_local_data`` —
  no host ever materializes another host's images.

CPU testing: the same code runs multi-process on CPU (gloo collectives);
tests/test_multihost.py spawns two processes with virtual CPU devices and
runs a real sharded train step across them.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from .mesh import Mesh, batch_sharding


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None,
               cpu_collectives: Optional[str] = None) -> Tuple[int, int]:
    """Initialize ``jax.distributed`` for multi-host execution.

    On Cloud TPU pods the arguments auto-detect from the environment
    (``jax.distributed.initialize()`` with no args); pass them explicitly
    for CPU tests or custom clusters. ``cpu_collectives`` ("gloo"/"mpi")
    selects the CPU cross-process collective backend (needed for CPU
    multi-process; ignored on TPU). Safe to call once per process, before
    any other jax API touches the backend.

    Returns (process_index, process_count).
    """
    if cpu_collectives:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def process_shard(indices: np.ndarray, process_index: int,
                  process_count: int) -> np.ndarray:
    """Disjoint strided per-process slice of an index list.

    Building block for HAND-ROLLED training loops over fixed-size data with
    ``len(indices)`` divisible by (batch x processes) — see
    tests/multihost_worker.py. The production loader does NOT use this: it
    builds a lockstep global batch schedule instead (pipeline.py), because
    a strided slice cannot keep per-process batch counts/shapes in agreement
    once bucketing or partial batches are involved."""
    if process_count <= 1:
        return indices
    return indices[process_index::process_count]


def global_batch(mesh: Mesh, local_arrays, global_batch_size: int):
    """Assemble logically-global device arrays from this process's local
    batch shard.

    ``local_arrays``: pytree of host numpy/jax arrays whose leading axis is
    the LOCAL batch (global_batch_size / process_count). Returns a pytree of
    global jax.Arrays sharded over the mesh "data" axis, each process
    holding only its own shard (jax.make_array_from_process_local_data).
    """
    sharding = batch_sharding(mesh)

    def make(x):
        x = np.asarray(x)
        global_shape = (global_batch_size,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(make, local_arrays)


def local_batch_size(global_batch_size: int) -> int:
    """Per-process batch share; global must divide evenly (pad the dataset
    epoch or choose batch sizes divisible by process_count)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible by "
                         f"process_count {n}")
    return global_batch_size // n


def is_coordinator() -> bool:
    """True on the process that should write checkpoints/logs (process 0)."""
    return jax.process_index() == 0
