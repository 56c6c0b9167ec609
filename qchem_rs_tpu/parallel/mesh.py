"""Device mesh helpers for multi-chip execution.

The reference is single-threaded CPU (SURVEY.md §2.2/§2.3); scale-out here is
pure JAX sharding over a ``Mesh`` with XLA collectives riding ICI — no
external communication backend.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
