"""Multi-device struct path (struct/par_struct.py) on the 8-device CPU mesh:
sharded stencil matvec and PFMG V-cycles with XLA-generated halos, numerics
and iteration parity vs single-device (reference behavior:
struct_mv/struct_communication.c + struct_ls/pfmg_solve.c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.parallel.mesh import make_mesh
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.struct import PFMG
from hypre_tpu.struct.matrix import struct_matvec
from hypre_tpu.struct.par_struct import (
    distribute_pfmg, distribute_struct_matrix, distribute_struct_vector,
)


def test_sharded_struct_matvec_matches():
    shape = (32, 16)
    A = struct_laplacian(shape, constant=False)  # variable coeffs shard
    mesh = make_mesh(8)
    Ad = distribute_struct_matrix(A, mesh)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape))
    xd = distribute_struct_vector(x, mesh)
    y_ref = np.asarray(struct_matvec(A, x))
    y = jax.jit(struct_matvec)(Ad, xd)
    # output inherits the input sharding under SPMD
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-12)
    assert len(y.sharding.device_set) == 8


def test_sharded_pfmg_iteration_parity():
    shape = (64, 32)
    A = struct_laplacian(shape)
    solver = PFMG().setup(A)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(shape))
    x_ref, info_ref = solver.solve(b, rtol=1e-6)

    mesh = make_mesh(8)
    sd = distribute_pfmg(solver, mesh)
    bd = distribute_struct_vector(b, mesh)
    x, info = sd.solve(bd, rtol=1e-6)
    assert int(info.iterations) == int(info_ref.iterations)
    r = b - struct_matvec(A, jnp.asarray(np.asarray(x)))
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert bool(info.converged) and rel < 2e-6
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), rtol=1e-4,
                               atol=1e-8)


def test_sharded_pfmg_3d():
    shape = (32, 8, 8)
    A = struct_laplacian(shape)
    solver = PFMG().setup(A)
    mesh = make_mesh(8)
    sd = distribute_pfmg(solver, mesh)
    b = distribute_struct_vector(
        jnp.asarray(np.random.default_rng(2).standard_normal(shape)), mesh
    )
    x, info = sd.solve(b, rtol=1e-6)
    assert bool(info.converged)
    assert int(info.iterations) <= 12
