"""Multi-host (pod / multi-slice) execution support.

hypre scales across nodes with MPI: every rank calls ``MPI_Init``, gets a
communicator, and the ParCSR layer's CommPkg routes neighbor traffic over
the interconnect (``utilities/mpistubs.c`` stubs it for serial builds).
The TPU-native equivalent is JAX's multi-controller runtime:

- ``jax.distributed.initialize`` = ``MPI_Init`` — every host process joins
  a coordination service, after which ``jax.devices()`` spans the whole
  pod and collectives compile across it.
- A ``Mesh`` over the global device list = the communicator. Sharding
  layout decides which traffic rides ICI (fast intra-slice interconnect)
  and which rides DCN (slower data-center network between slices/hosts).

The layout rule (scaling-book recipe): put the *solver row axis* — where
halo exchange and dot-product reductions live — on ICI-contiguous devices,
and put any outer replication/batch axis on DCN. ``make_pod_mesh`` builds
exactly that: axes ``("dcn", "rows")`` with ``rows`` innermost so each
slice's devices are contiguous in the row partition, mirroring hypre's
rank-contiguous ``row_starts`` partitioning (``parcsr_mv/par_csr_matrix.c``
keeps each rank's rows contiguous for the same reason).

Weak-scaling expectation on real pods: the neighbor ppermute halo
(``parallel/halo.py``) exchanges O(boundary) bytes per step between
row-adjacent shards; with the boundary between hosts crossing DCN exactly
once per axis, the DCN term stays O(1) per host as hosts are added — the
design target BASELINE.md states (>=80% weak scaling on 2+ hosts).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from hypre_tpu.parallel.mesh import ROW_AXIS

DCN_AXIS = "dcn"

_initialized = False


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> int:
    """Join (or start) the multi-controller runtime — the MPI_Init of the
    TPU world.

    With no arguments, JAX auto-detects cluster environments (TPU pods via
    the metadata server, GKE/Slurm/OpenMPI via env vars). For manual
    bring-up, pass the coordinator's ``host:port`` plus the process count
    and this process's id — the same triple ``mpirun`` distributes as rank
    and size.

    Idempotent: safe to call more than once in a process (subsequent calls
    are no-ops, like MPI_Initialized guards in hypre's drivers).

    Returns the process id (rank).
    """
    global _initialized
    if not _initialized:
        # was jax.distributed already brought up by the launcher/user?
        # (must NOT probe via jax.process_count() — that would initialize
        # the XLA backend, after which initialize() refuses to run)
        try:
            from jax._src import distributed as _jd

            _initialized = _jd.global_state.client is not None
        except Exception:
            pass
    if _initialized:
        return jax.process_index()
    # auto-join only when a launcher explicitly marks a multi-process job
    # (HYPRE_TPU_MULTIHOST=1, or an MPI/Slurm world of size > 1). A bare
    # TPU env var is NOT enough: single-chip dev environments set TPU
    # metadata too, and jax.distributed.initialize must not run after
    # backends initialize.
    auto = (
        coordinator_address is None
        and num_processes is None
        and (
            os.environ.get("HYPRE_TPU_MULTIHOST") == "1"
            or int(os.environ.get("OMPI_COMM_WORLD_SIZE", "1")) > 1
            or int(os.environ.get("SLURM_NTASKS", "1")) > 1
        )
    )
    if coordinator_address is not None or num_processes is not None or auto:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    _initialized = True
    return jax.process_index()


def shutdown_multihost() -> None:
    """Leave the multi-controller runtime (MPI_Finalize analogue)."""
    global _initialized
    if _initialized and jax.process_count() > 1:
        jax.distributed.shutdown()
    _initialized = False


def make_pod_mesh(
    devices=None,
    hosts: Optional[int] = None,
) -> Mesh:
    """2-D pod mesh with axes ``(dcn, rows)``.

    ``rows`` (innermost) spans each host/slice's local devices — halo
    exchange and reductions along it ride ICI. ``dcn`` spans
    hosts/slices — only the one inter-host boundary row block per
    neighbor pair crosses it. ``hosts`` defaults to
    ``jax.process_count()`` (1 on a single host, where the dcn axis is
    size 1 and the mesh degenerates to the plain row mesh).

    For a solver that wants a single flat row axis across the whole pod,
    reshape with ``flat_row_mesh`` instead — same device order, so row
    blocks stay host-contiguous either way.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if hosts is None:
        hosts = max(jax.process_count(), 1)
    if len(devices) % hosts:
        raise ValueError(f"{len(devices)} devices not divisible by {hosts} hosts")
    return Mesh(devices.reshape(hosts, -1), (DCN_AXIS, ROW_AXIS))


def flat_row_mesh(devices=None) -> Mesh:
    """1-D row mesh over every device in the pod, host-major ordered so
    each host's row block is contiguous (hypre's rank-contiguous
    row_starts; keeps inter-host halo traffic to one boundary per
    neighbor pair)."""
    if devices is None:
        devices = jax.devices()
    devices = sorted(
        devices, key=lambda d: (d.process_index, getattr(d, "id", 0))
    )
    return Mesh(np.array(devices), (ROW_AXIS,))


def host_row_ranges(n_global: int, mesh: Mesh) -> list[tuple[int, int]]:
    """Per-host [start, end) global row ranges under equal per-device
    blocks on ``mesh``'s row axis — what each process should assemble
    locally (the IJ interface's ILower/IUpper per rank)."""
    n_dev = mesh.devices.size
    per_host = {}
    block = -(-n_global // n_dev)
    for i, d in enumerate(mesh.devices.flatten()):
        lo = min(i * block, n_global)
        hi = min((i + 1) * block, n_global)
        p = d.process_index
        if p in per_host:
            per_host[p] = (min(per_host[p][0], lo), max(per_host[p][1], hi))
        else:
            per_host[p] = (lo, hi)
    return [per_host[p] for p in sorted(per_host)]
