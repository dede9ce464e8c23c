"""Distributed AMG — partition a hierarchy across a device mesh.

Round-1 division of labor (matches SURVEY.md §7's staging): AMG *setup* runs
on the global operator (host-orchestrated, single logical array — XLA still
executes the kernels on device), and the resulting hierarchy is then
*partitioned* so the solve phase — the part hypre runs at scale every cycle,
``par_cycle.c`` — executes fully distributed: halo-exchange SpMVs for A/P/Pt,
psum inner products, replicated dense coarse solve (hypre gathers the coarse
system to a subcommunicator the same way, ``par_gauss_elim.c:84-118``).

Because Level/AMGHierarchy are distribution-agnostic (the matrix operator
protocol), ``amg_cycle`` and every smoother run unchanged on the partitioned
hierarchy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hypre_tpu.amg.hierarchy import AMGHierarchy, Level
from hypre_tpu.core.partition import RowPartition
from hypre_tpu.parallel.mesh import ROW_AXIS, row_sharding
from hypre_tpu.parallel.par_ell import partition_ell, distribute_vector


def partition_hierarchy(hier: AMGHierarchy, mesh: Mesh) -> AMGHierarchy:
    nshards = mesh.devices.size
    levels = []
    for lev in hier.levels:
        n_fine = lev.A.n_rows
        n_coarse = lev.P.n_cols
        fine_part = RowPartition(n_fine, nshards)
        coarse_part = RowPartition(n_coarse, nshards)
        levels.append(
            Level(
                A=partition_ell(lev.A, mesh),
                P=partition_ell(lev.P, mesh, col_part=coarse_part),
                Pt=partition_ell(lev.Pt, mesh, col_part=fine_part),
                dinv=distribute_vector(np.asarray(lev.dinv), mesh, n_fine),
                l1inv=distribute_vector(np.asarray(lev.l1inv), mesh, n_fine),
                lmax=lev.lmax,
            )
        )
    ci = np.asarray(hier.coarse_inv)
    nc = ci.shape[0]
    c_part = RowPartition(nc, nshards)
    ci_pad = np.zeros((c_part.n_padded, c_part.n_padded), ci.dtype)
    ci_pad[:nc, :nc] = ci
    coarse_inv = jax.device_put(
        jnp.asarray(ci_pad), NamedSharding(mesh, P(ROW_AXIS, None))
    )
    return AMGHierarchy(levels=levels, coarse_inv=coarse_inv)
