"""Mesh construction, batch sharding, multi-host init.

Replaces the reference's process-group bootstrap (utils.py:268-312: env-var /
SLURM rank discovery + NCCL/gloo selection) with JAX's SPMD model:

  * single host, N chips: ``data_parallel_mesh()`` over local devices
  * multi host: ``init_distributed()`` -> jax.distributed.initialize (DCN
    rendezvous), then the same mesh over all global devices

There is no backend selection — XLA compiles the collectives onto ICI/DCN.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bootstrap. Reads env (JAX coordinator / SLURM) like the
    reference read RANK/WORLD_SIZE/SLURM_PROCID (utils.py:273-283).

    Returns True if distributed mode was initialised (idempotent: callers
    like tests may bootstrap before handing control to cli/train.main, which
    also calls this)."""
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    if num_processes is None:
        if "SLURM_NTASKS" in os.environ:
            num_processes = int(os.environ["SLURM_NTASKS"])
            process_id = int(os.environ.get("SLURM_PROCID", 0))
        elif "JAX_NUM_PROCESSES" in os.environ:
            num_processes = int(os.environ["JAX_NUM_PROCESSES"])
            process_id = int(os.environ.get("JAX_PROCESS_ID", 0))
    if not num_processes or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


_initialized = False


def is_main_process() -> bool:
    """Rank-0 guard for I/O (checkpoints, logs) — the reference's
    save_on_master / print-monkeypatch equivalent (utils.py:223-265)."""
    return jax.process_index() == 0


def data_parallel_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_batch(batch: Dict[str, Any], mesh: Mesh):
    """Place a host batch with the leading (batch) axis split over the mesh.

    Single process: a plain device_put split over local devices. Multi
    process: each host holds only its local rows
    (batch_size * local_device_count), so the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the SPMD replacement for the
    reference's per-rank DistributedSampler batches (train.py:594-607)."""
    multiprocess = jax.process_count() > 1

    def put(x):
        spec = P(DATA_AXIS) if getattr(x, "ndim", 0) >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multiprocess:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate parameters/optimizer state across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
