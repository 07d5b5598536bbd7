"""Multi-host runtime initialization + mesh construction.

The TPU-native counterpart of "NCCL/MPI setup" the reference never needed
(SURVEY.md §2, parallelism): `jax.distributed.initialize` wires the hosts
(ICI within a slice, DCN across slices); `make_global_mesh` lays the "rows"
tile-sharding axis across every chip in the job so
`parallel.sharded.rasterize_sharded` and the train step scale unchanged
from 1 chip to a pod slice — splat-parameter gradients ride the shard_map
transpose's psum over ICI.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh

from tpu2dgs.parallel.sharded import ROWS_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent multi-host init. With no args, reads the standard cluster
    env (TPU pod metadata / JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES +
    JAX_PROCESS_ID); single-process runs are a no-op."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if num_processes is None and coordinator_address is None:
        return  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def configure_cpu_rehearsal(local_devices: int = 2) -> None:
    """Configure THIS process for a multi-process rehearsal on CPU: local
    virtual devices + gloo cross-process collectives. Must run before any
    backend initialization. This is the no-hardware dress rehearsal for a
    real multi-host job — the sharding program and `initialize` env parsing
    are identical; only the transport differs (gloo vs ICI/DCN)."""
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")


def make_global_mesh(axis: str = ROWS_AXIS) -> Mesh:
    """1-D mesh over every chip in the job (all hosts)."""
    return Mesh(jax.devices(), (axis,))


def is_primary() -> bool:
    return jax.process_index() == 0
