"""Device mesh helpers for multi-chip execution.

The reference is single-threaded CPU (SURVEY.md §2.2/§2.3); scale-out here is
pure JAX sharding over a ``Mesh`` with XLA collectives riding ICI — no
external communication backend.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host bring-up: ``jax.distributed.initialize`` wrapper
    (SURVEY.md §2.3 — the reference is single-process; here multi-host pods
    join one JAX runtime so ``jax.devices()`` spans all hosts and the mesh
    collectives ride ICI/DCN).

    Arguments default to the JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID environment variables (the standard launcher contract);
    with no configuration at all this is a no-op returning False so
    single-host runs need no special casing. Safe to call twice.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator_address is None or num_processes is None or num_processes <= 1:
        return False
    if getattr(distributed_init, "_initialized", False):
        return True
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    distributed_init._initialized = True
    return True


def data_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    """1D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "batch") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
