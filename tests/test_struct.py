"""Struct layer tests — matvec/transfer-operator oracles + solver convergence.

Follows the reference's test style (TEST_struct golden philosophy: check
iteration counts and residual norms); oracles are dense materializations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu.problems.struct_problems import random_struct_matrix, struct_laplacian
from hypre_tpu.struct import PFMG, SMG, StructJacobi, cyclic_reduction_solve
from hypre_tpu.struct.cycred import pcr_solve
from hypre_tpu.struct.matrix import struct_matvec, struct_matvec_t
from hypre_tpu.struct.probe import probe_stencil
from hypre_tpu.struct.semi import semi_interp_from_matrix


def rand(shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape))


# ---------------------------------------------------------------------------
# matvec oracles
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(7,), (6, 5), (4, 5, 3)])
def test_struct_matvec_vs_dense(shape):
    A = random_struct_matrix(shape, extent=1, seed=1)
    x = rand(shape, 2)
    dense = np.asarray(A.to_dense())
    want = dense @ np.asarray(x).reshape(-1)
    got = np.asarray(struct_matvec(A, x)).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_struct_matvec_t_vs_dense():
    shape = (6, 5)
    A = random_struct_matrix(shape, extent=1, seed=3)
    x = rand(shape, 4)
    dense = np.asarray(A.to_dense())
    want = dense.T @ np.asarray(x).reshape(-1)
    got = np.asarray(struct_matvec_t(A, x)).reshape(-1)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_periodic_matvec():
    A = struct_laplacian((8,))
    import dataclasses

    Ap = dataclasses.replace(A, periodic=(True,))
    ones = jnp.ones((8,))
    # periodic Laplacian annihilates constants
    np.testing.assert_allclose(np.asarray(struct_matvec(Ap, ones)), 0.0, atol=1e-14)


# ---------------------------------------------------------------------------
# probing
# ---------------------------------------------------------------------------


def test_probe_recovers_stencil():
    shape = (6, 7)
    A = random_struct_matrix(shape, extent=1, seed=5)
    B = probe_stencil(lambda x: struct_matvec(A, x), shape, (1, 1), A.dtype)
    x = rand(shape, 6)
    np.testing.assert_allclose(
        np.asarray(struct_matvec(B, x)),
        np.asarray(struct_matvec(A, x)),
        rtol=1e-12,
    )


def test_probe_overestimated_extent_prunes():
    shape = (9, 9)
    A = struct_laplacian(shape)
    B = probe_stencil(lambda x: struct_matvec(A, x), shape, (2, 2), A.dtype)
    # 5-pt operator probed with extent 2: pruning should drop the zero shells
    assert B.stencil.size == 5


# ---------------------------------------------------------------------------
# semicoarsening transfers
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape,cdir", [((9, 8), 0), ((9, 8), 1), ((5, 6, 7), 2)])
def test_semi_interp_adjoint(shape, cdir):
    A = random_struct_matrix(shape, extent=1, seed=7)
    P = semi_interp_from_matrix(A, cdir)
    xc = rand(P.coarse_shape, 8)
    yf = rand(shape, 9)
    lhs = float(jnp.sum(P.apply(xc) * yf))
    rhs = float(jnp.sum(xc * P.apply_t(yf)))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)


def test_rap_probing_matches_dense_galerkin():
    shape = (9, 6)
    cdir = 0
    A = struct_laplacian(shape)
    P = semi_interp_from_matrix(A, cdir)
    cshape = P.coarse_shape
    nc = int(np.prod(cshape))
    # dense P from basis vectors
    eyec = jnp.eye(nc).reshape((nc,) + cshape)
    Pd = jax.vmap(lambda e: P.apply(e).reshape(-1))(eyec).T
    Ad = A.to_dense()
    want = np.asarray(Pd).T @ np.asarray(Ad) @ np.asarray(Pd)
    Ac = probe_stencil(
        lambda xc: P.apply_t(struct_matvec(A, P.apply(xc))), cshape, (1, 1), A.dtype
    )
    got = np.asarray(Ac.to_dense())
    np.testing.assert_allclose(got, want, atol=1e-11)


# ---------------------------------------------------------------------------
# tridiagonal PCR
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 2, 3, 8, 17, 33])
def test_pcr_solve(n):
    rng = np.random.default_rng(n)
    a = rng.standard_normal((4, n))
    c = rng.standard_normal((4, n))
    b = np.abs(a) + np.abs(c) + 1.0 + rng.random((4, n))
    d = rng.standard_normal((4, n))
    a[:, 0] = 0
    c[:, -1] = 0
    x = np.asarray(pcr_solve(*map(jnp.asarray, (a, b, c, d))))
    for i in range(4):
        T = np.diag(b[i]) + np.diag(a[i][1:], -1) + np.diag(c[i][:-1], 1)
        np.testing.assert_allclose(T @ x[i], d[i], rtol=1e-9, atol=1e-9)


def test_cyclic_reduction_direct():
    A = struct_laplacian((37,))
    b = rand((37,), 11)
    x = cyclic_reduction_solve(A, b)
    r = b - struct_matvec(A, x)
    assert float(jnp.linalg.norm(r)) < 1e-10 * float(jnp.linalg.norm(b))


# ---------------------------------------------------------------------------
# solvers
# ---------------------------------------------------------------------------


def _solve_check(solver, A, shape, rtol=1e-6, max_expected=None):
    b = jnp.asarray(np.random.default_rng(0).standard_normal(shape))
    x, info = solver.solve(b, rtol=rtol)
    r = b - struct_matvec(A, x)
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert bool(info.converged), f"did not converge: {info}"
    assert rel <= rtol * 1.5
    if max_expected is not None:
        assert int(info.iterations) <= max_expected, f"{info}"
    return info


def test_pfmg_2d():
    A = struct_laplacian((32, 32))
    info = _solve_check(PFMG().setup(A), A, (32, 32), max_expected=12)
    assert int(info.iterations) >= 3


def test_pfmg_3d():
    A = struct_laplacian((12, 12, 12))
    _solve_check(PFMG().setup(A), A, (12, 12, 12), max_expected=12)


def test_pfmg_anisotropic():
    # eps=0.01 anisotropy: semicoarsening must pick the strong direction
    A = struct_laplacian((32, 32), weights=(1.0, 0.01))
    _solve_check(PFMG(relax_type="jacobi").setup(A), A, (32, 32), max_expected=20)


def test_pfmg_as_pcg_preconditioner():
    from hypre_tpu.krylov import pcg

    A = struct_laplacian((24, 24))
    pf = PFMG().setup(A)
    b = rand((24, 24), 1).reshape(-1)
    op = A.as_linear_op()
    x, info = pcg(op, b, M=pf.precond(), rtol=1e-8, maxiter=50)
    assert bool(info.converged)
    assert int(info.iterations) <= 10


def test_smg_2d():
    A = struct_laplacian((24, 24))
    _solve_check(SMG().setup(A), A, (24, 24), max_expected=10)


def test_smg_3d():
    A = struct_laplacian((10, 10, 10))
    _solve_check(SMG().setup(A), A, (10, 10, 10), max_expected=12)


def test_smg_anisotropic():
    A = struct_laplacian((24, 24), weights=(0.001, 1.0))
    _solve_check(SMG().setup(A), A, (24, 24), max_expected=12)


@pytest.mark.slow
def test_smg_3d_plane_solve_strong_inplane_coupling():
    """Strong x-y coupling, weak z: zebra plane relaxation must actually
    invert the in-plane operator (hypre's recursive 2-D SMG per plane,
    smg_relax.c) — the alternating-line approximation stalls here
    (measured: 4 iters vs no convergence in 60)."""
    A = struct_laplacian((16, 16, 16), weights=(1.0, 1.0, 0.001))
    _solve_check(SMG().setup(A), A, (16, 16, 16), max_expected=6)


def test_struct_jacobi():
    A = struct_laplacian((8, 8))
    info = _solve_check(StructJacobi().setup(A), A, (8, 8), rtol=1e-5)
    assert int(info.iterations) > 10  # sanity: it's Jacobi, not magic


# ---------------------------------------------------------------------------
# SparseMSG (struct_ls/sparse_msg*.c analogue)
# ---------------------------------------------------------------------------


def test_sparse_msg_solves_laplacian():
    from hypre_tpu.struct import SparseMSG

    A = struct_laplacian((16, 16))
    b = jnp.ones(A.shape, A.dtype)
    msg = SparseMSG().setup(A)
    x, info = msg.solve(b, rtol=1e-8, maxiter=60)
    assert bool(info.converged), f"{info}"
    r = b - struct_matvec(A, x)
    assert float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel())) < 1e-6


def test_sparse_msg_anisotropic_beats_wrong_direction():
    """MSG's selling point: no single coarsening-direction choice. On a
    strongly anisotropic operator it must converge robustly without being
    told the direction (PFMG reads it from dxyz; MSG just doesn't care —
    at the cost of a milder rate than a correctly-directed PFMG)."""
    from hypre_tpu.struct import SparseMSG
    from hypre_tpu.struct.stencil import StructStencil

    eps = 1e-3
    nx = ny = 16
    stencil = StructStencil(offsets=((0, 0), (-1, 0), (1, 0), (0, -1), (0, 1)))
    coeffs = jnp.stack([
        jnp.full((nx, ny), 2.0 + 2.0 * eps),
        jnp.full((nx, ny), -1.0),
        jnp.full((nx, ny), -1.0),
        jnp.full((nx, ny), -eps),
        jnp.full((nx, ny), -eps),
    ])
    from hypre_tpu.struct.matrix import StructMatrix

    A = StructMatrix(coeffs=coeffs, stencil=stencil, shape=(nx, ny))
    b = jnp.ones(A.shape, A.dtype)
    msg = SparseMSG().setup(A)
    x, info = msg.solve(b, rtol=1e-8, maxiter=80)
    assert bool(info.converged)
    assert int(info.iterations) <= 50


def test_sparse_msg_jump_skips_relaxation_but_converges():
    from hypre_tpu.struct import SparseMSG

    A = struct_laplacian((16, 16))
    b = jnp.ones(A.shape, A.dtype)
    msg = SparseMSG(jump=1).setup(A)
    x, info = msg.solve(b, rtol=1e-8, maxiter=120)
    assert bool(info.converged)


def test_struct_hybrid_escalates_to_pfmg():
    """Hybrid (struct_ls/hybrid.c): DSCG with a convergence-factor cutoff,
    escalating to PFMG-PCG when it stalls. On a sizeable grid with a tight
    dscg budget, phase 1 must give up and phase 2 must finish."""
    from hypre_tpu.struct import StructHybrid

    A = struct_laplacian((32, 32))
    b = jnp.ones(A.shape, A.dtype)
    hy = StructHybrid(dscg_max_iter=10).setup(A)
    x, info = hy.solve(b, rtol=1e-8)
    assert bool(info.converged)
    assert hy.dscg_iterations >= 1
    assert hy.mg_iterations >= 1  # escalation actually happened
    r = b - struct_matvec(A, x)
    assert float(jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b.ravel())) < 1e-6


def test_struct_hybrid_stays_cheap_when_easy():
    from hypre_tpu.struct import StructHybrid

    A = struct_laplacian((8, 8))
    b = jnp.ones(A.shape, A.dtype)
    hy = StructHybrid().setup(A)
    x, info = hy.solve(b, rtol=1e-8)
    assert bool(info.converged)
    assert hy.mg_iterations == 0  # diagonal scaling was enough


def test_pfmg_periodic_x():
    # periodic in x, Dirichlet in y: nonsingular, coarse stencils must wrap
    # correctly at the seam (probe.py periodic modulus; semi.py periodic
    # interpolation — reference struct periodicity, struct_grid.c)
    A = struct_laplacian((32, 32), periodic=(True, False))
    info = _solve_check(PFMG().setup(A), A, (32, 32), max_expected=14)
    assert int(info.iterations) >= 3


def test_smg_periodic_x():
    A = struct_laplacian((16, 16), periodic=(True, False))
    _solve_check(SMG().setup(A), A, (16, 16), max_expected=14)


def test_struct_object_io_roundtrip(tmp_path):
    """hypre_StructMatrixPrint/Read + StructVectorPrint/Read analogues
    (struct_matrix.c:1764,1856, struct_io.c): object-level roundtrip."""
    from hypre_tpu.struct.io import (
        print_struct_matrix, print_struct_vector, read_struct_matrix,
        read_struct_vector,
    )
    from hypre_tpu.problems.struct_problems import struct_laplacian

    A = struct_laplacian((6, 5))
    p = str(tmp_path / "A.struct")
    print_struct_matrix(p, A)
    B = read_struct_matrix(p, A.dtype)
    assert B.stencil.offsets == A.stencil.offsets
    assert B.shape == A.shape and B.periodic == A.periodic
    np.testing.assert_allclose(np.asarray(B.coeffs), np.asarray(A.coeffs))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(A.shape), A.dtype)
    pv = str(tmp_path / "x.struct")
    print_struct_vector(pv, x)
    y = read_struct_vector(pv, A.dtype)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)
    # constant-coefficient variant
    from hypre_tpu.struct.matrix import struct_from_dense_coeffs

    C = struct_from_dense_coeffs(
        {(0, 0): 4.0, (0, 1): -1.0, (0, -1): -1.0}, (6, 5), dtype=A.dtype
    )
    pc = str(tmp_path / "C.struct")
    print_struct_matrix(pc, C)
    C2 = read_struct_matrix(pc, A.dtype)
    assert C2.is_constant
    np.testing.assert_allclose(np.asarray(C2.coeffs), np.asarray(C.coeffs))


def test_sstruct_object_io_roundtrip(tmp_path):
    """HYPRE_SStructMatrix/VectorPrint analogues (2.25 CHANGELOG:20)."""
    from hypre_tpu.struct.io import (
        print_sstruct_matrix, print_sstruct_vector, read_sstruct_matrix,
        read_sstruct_vector,
    )
    from hypre_tpu.problems.struct_problems import struct_laplacian
    from hypre_tpu.sstruct.grid import SStructGrid
    from hypre_tpu.sstruct.matrix import SStructMatrix
    from hypre_tpu.seq.ell import EllMatrix

    grid = SStructGrid(((4, 3), (3, 3)))
    parts = (struct_laplacian((4, 3)), struct_laplacian((3, 3)))
    n = grid.total_size
    U = EllMatrix(
        vals=jnp.zeros((n, 2)).at[0, 0].set(-1.0).at[12, 0].set(-1.0),
        cols=jnp.full((n, 2), -1, jnp.int32).at[0, 0].set(12).at[12, 0].set(0),
        n_cols=n,
    )
    A = SStructMatrix(parts=parts, U=U, grid=grid)
    d = str(tmp_path / "ss")
    print_sstruct_matrix(d, A)
    B = read_sstruct_matrix(d, A.dtype)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n), A.dtype)
    np.testing.assert_allclose(
        np.asarray(B.mv(x)), np.asarray(A.mv(x)), rtol=1e-5, atol=1e-6
    )
    dv = str(tmp_path / "ssv")
    print_sstruct_vector(dv, grid, x)
    y = read_sstruct_vector(dv, A.dtype)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-6)
