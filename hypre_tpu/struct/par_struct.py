"""Multi-device structured grids — sharded boxes with automatic halos.

hypre's struct layer distributes boxes across ranks and hand-builds ghost
exchanges (``struct_mv/struct_communication.c:37,777``: CommInfo box lists →
CommType per peer → strided pack/unpack). The TPU-native equivalent needs
none of that machinery: a struct grid IS a dense array, so sharding its
leading dim over the mesh (``NamedSharding(P('rows', ...))``) and running
the exact same stencil code under ``jit`` lets XLA's SPMD partitioner lower
every ``shift`` (pad+slice) into the minimal halo ``CollectivePermute`` —
the compiler plays the role of hypre's CommPkg, including overlap
scheduling (the indt/dept computation split of ``computation.c`` becomes
XLA latency hiding).

What this module adds is the thin policy layer: placement helpers, the
sharding-aware hierarchy placement for PFMG/SMG (coarse grids whose sharded
dim no longer divides the mesh fall back to replication, like hypre
gathering small grids), and tests pin numerics + iteration parity against
the single-device path (``tests/test_struct_parallel.py``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hypre_tpu.parallel.mesh import ROW_AXIS
from hypre_tpu.struct.matrix import StructMatrix
from hypre_tpu.struct.pfmg import PFMG
from hypre_tpu.struct.smg import SMG


def grid_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """Shard grid dim ``axis`` over the 1-D mesh, replicate the rest."""
    spec = [None] * ndim
    spec[axis] = ROW_AXIS
    return NamedSharding(mesh, P(*spec))


def _placeable(shape, mesh: Mesh, axis: int) -> bool:
    return shape[axis] % mesh.devices.size == 0 and shape[axis] >= mesh.devices.size


def distribute_struct_vector(x: jax.Array, mesh: Mesh, axis: int = 0):
    if not _placeable(x.shape, mesh, axis):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.device_put(x, grid_sharding(mesh, x.ndim, axis))


def distribute_struct_matrix(A: StructMatrix, mesh: Mesh, axis: int = 0) -> StructMatrix:
    """Place a StructMatrix's coefficient arrays on the mesh. Constant
    coefficients stay replicated scalars; variable coefficients shard with
    the grid (coeffs carry a leading stencil axis, so the grid dim shifts
    by one)."""
    if A.coeffs.ndim == 1:  # constant-coefficient stencil: tiny, replicate
        coeffs = jax.device_put(A.coeffs, NamedSharding(mesh, P()))
    elif _placeable(A.shape, mesh, axis):
        coeffs = jax.device_put(
            A.coeffs, grid_sharding(mesh, A.coeffs.ndim, axis + 1)
        )
    else:
        coeffs = jax.device_put(A.coeffs, NamedSharding(mesh, P()))
    return dataclasses.replace(A, coeffs=coeffs)


def distribute_pfmg(solver: PFMG, mesh: Mesh, axis: int = 0) -> PFMG:
    """Re-place a set-up PFMG hierarchy across the mesh: every level whose
    grid still divides the mesh shards; smaller coarse grids replicate
    (hypre's analogue: boxes coalesce onto fewer ranks as grids shrink)."""
    hier = solver.hierarchy
    assert hier is not None, "call setup(A) first"
    new_levels = []
    for lev in hier.levels:
        A = distribute_struct_matrix(lev.A, mesh, axis)
        P_ = lev.P
        if P_ is not None and _placeable(P_.fine_shape, mesh, axis):
            sh = grid_sharding(mesh, len(P_.fine_shape), axis)
            P_ = dataclasses.replace(
                P_,
                w_lo=jax.device_put(P_.w_lo, sh),
                w_hi=jax.device_put(P_.w_hi, sh),
            )
        dinv = (
            jax.device_put(lev.dinv, grid_sharding(mesh, lev.dinv.ndim, axis))
            if _placeable(lev.dinv.shape, mesh, axis)
            else jax.device_put(lev.dinv, NamedSharding(mesh, P()))
        )
        red = (
            jax.device_put(lev.red, grid_sharding(mesh, lev.red.ndim, axis))
            if _placeable(lev.red.shape, mesh, axis)
            else jax.device_put(lev.red, NamedSharding(mesh, P()))
        )
        new_levels.append(dataclasses.replace(lev, A=A, P=P_, dinv=dinv, red=red))
    coarse_inv = jax.device_put(hier.coarse_inv, NamedSharding(mesh, P()))
    out = dataclasses.replace(solver)
    out.hierarchy = dataclasses.replace(
        hier, levels=new_levels, coarse_inv=coarse_inv
    )
    return out
