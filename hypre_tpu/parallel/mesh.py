"""Device mesh helpers.

hypre's execution contexts are MPI communicators; the TPU equivalent is a
1-D ``jax.sharding.Mesh`` over the row axis. hypre's rank count maps to the
mesh size; the ``HYPRE_SEQUENTIAL`` serial build maps to a 1-device mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "rows"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if num_devices is not None:
            if len(devices) < num_devices:
                raise ValueError(
                    f"make_mesh({num_devices}) but only {len(devices)} "
                    f"devices visible on backend "
                    f"'{jax.default_backend()}' — pass devices= explicitly "
                    "(e.g. jax.devices('cpu') with "
                    "--xla_force_host_platform_device_count)"
                )
            devices = devices[:num_devices]
    return Mesh(np.array(devices), (ROW_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(ROW_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
