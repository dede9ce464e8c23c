"""Tests for the second Krylov wave: FlexGMRES, LGMRES, COGMRES, CGNR,
LOBPCG, and the Hybrid driver (TEST_ij solver-id coverage 16/17, 50/51,
60/61, 5/6, 20, LOBPCG cases)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu import laplacian_2d_5pt
from hypre_tpu.amg.hybrid import HybridSolver
from hypre_tpu.krylov import (
    block_op,
    cgnr,
    cogmres,
    flexgmres,
    lgmres,
    lobpcg,
    pcg,
)
from hypre_tpu.seq.ell import ell_from_dense, ell_spmv, ell_spmv_t


def _laplacian_op(n=16):
    A = laplacian_2d_5pt(n, n)
    return A, lambda v: ell_spmv(A, v)


def _nonsym_system(n=80, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.standard_normal((n, n)) * 0.3
    M += np.diag(np.abs(M).sum(axis=1) + 1.0)  # diagonally dominant, nonsym
    A = ell_from_dense(M)
    b = jnp.asarray(rng.standard_normal(n))
    return M, A, b


@pytest.mark.parametrize("solver", [flexgmres, lgmres, cogmres])
def test_gmres_variants_nonsymmetric(solver):
    M, A, b = _nonsym_system()
    x, info = solver(lambda v: ell_spmv(A, v), b, rtol=1e-10, maxiter=300)
    assert bool(info.converged), f"{solver.__module__}: {info}"
    np.testing.assert_allclose(M @ np.asarray(x), np.asarray(b), rtol=0, atol=1e-7)


def test_flexgmres_variable_preconditioner():
    A, op = _laplacian_op(12)
    dinv = 1.0 / A.diagonal()
    # deliberately iteration-varying preconditioner: flexgmres must still
    # converge where standard gmres's theory breaks
    count = [0]

    def M(r):
        count[0] += 1
        return dinv * r * (1.0 + 0.1 * (count[0] % 3))

    b = jnp.ones(A.n_rows, A.dtype)
    x, info = flexgmres(op, b, M=M, rtol=1e-8, maxiter=200)
    r = b - op(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-6


def test_lgmres_beats_gmres_budget():
    M, A, b = _nonsym_system(n=120, seed=3)
    x, info = lgmres(
        lambda v: ell_spmv(A, v), b, rtol=1e-8, maxiter=400, k_dim=10, aug_dim=2
    )
    assert bool(info.converged)


def test_cgnr_nonsymmetric():
    M, A, b = _nonsym_system(n=60, seed=5)
    op = lambda v: ell_spmv(A, v)
    opt = lambda v: ell_spmv_t(A, v)
    x, info = cgnr(op, opt, b, rtol=1e-8, maxiter=2000)
    assert bool(info.converged)
    np.testing.assert_allclose(M @ np.asarray(x), np.asarray(b), rtol=0, atol=1e-5)


def test_pcg_cf_tol_cuts_slow_convergence():
    A, op = _laplacian_op(24)  # plain CG on a 24x24 Laplacian is slow
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = pcg(op, b, rtol=1e-12, maxiter=1000, cf_tol=0.5)
    # cf of unpreconditioned CG here is ~0.8+ so the cutoff must trip early
    assert not bool(info.converged)
    assert int(info.iterations) < 50


def test_hybrid_escalates_to_amg():
    A = laplacian_2d_5pt(48, 48)
    b = jnp.ones(A.n_rows, A.dtype)
    hy = HybridSolver(cf_tol=0.5, dscg_max_iter=500).setup(A)
    x, info = hy.solve(b, rtol=1e-8)
    assert bool(info.converged)
    assert hy.amg_iterations > 0, "expected escalation to AMG"
    r = b - ell_spmv(A, x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-7


def test_hybrid_stays_diagonal_when_easy():
    # well-conditioned system: DSCG converges fast, no AMG setup needed
    n = 64
    rng = np.random.default_rng(7)
    M = np.diag(rng.random(n) + 1.0)
    A = ell_from_dense(M)
    b = jnp.asarray(rng.standard_normal(n))
    hy = HybridSolver(cf_tol=0.9).setup(A)
    x, info = hy.solve(b, rtol=1e-10)
    assert bool(info.converged)
    assert hy.amg_iterations == 0


def test_lobpcg_laplacian_lowest_modes():
    # 1-D Laplacian: eigenvalues 2 - 2 cos(k pi / (n+1)) known exactly
    n, m = 64, 4
    from hypre_tpu.problems.laplacian import laplacian_1d

    A = laplacian_1d(n)
    op = block_op(lambda v: ell_spmv(A, v))
    X0 = jnp.asarray(np.random.default_rng(11).standard_normal((n, m)))
    lam, X, rn = lobpcg(op, X0, tol=1e-8, maxiter=300)
    k = np.arange(1, m + 1)
    want = 2.0 - 2.0 * np.cos(k * np.pi / (n + 1))
    np.testing.assert_allclose(np.sort(np.asarray(lam)), want, rtol=1e-6)


def test_lobpcg_with_preconditioner_converges_faster():
    n, m = 100, 2
    rng = np.random.default_rng(13)
    d = np.linspace(1.0, 500.0, n)
    A_dense = np.diag(d)
    A = ell_from_dense(A_dense)
    op = block_op(lambda v: ell_spmv(A, v))
    T = block_op(lambda v: v / jnp.asarray(d))
    X0 = jnp.asarray(rng.standard_normal((n, m)))
    lam, X, rn = lobpcg(op, X0, T=T, tol=1e-8, maxiter=200)
    np.testing.assert_allclose(np.sort(np.asarray(lam)), d[:m], rtol=1e-5)


def test_logging_res_history_pcg_gmres_bicgstab():
    # hypre SetLogging analogue: res_history records per-iteration norms
    # consistent with the final residual (pcg.c:630-634)
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.seq.ell import ell_spmv
    from hypre_tpu.krylov import bicgstab, gmres, pcg
    from hypre_tpu.stats import format_iteration_log

    A = laplacian_2d_5pt(16, 16)
    b = jnp.ones(A.n_rows, A.dtype)
    op = lambda v: ell_spmv(A, v)
    bn = float(jnp.linalg.norm(b))
    for solver in (pcg, bicgstab):
        x, info = solver(op, b, rtol=1e-6, maxiter=200, logging=1)
        h = np.asarray(info.res_history)
        it = int(info.iterations)
        assert h[0] > 0  # initial ||r||
        assert (h[1:it + 1] > 0).all()
        # final recorded norm matches the reported relative residual
        np.testing.assert_allclose(h[it] / bn, float(info.relative_residual),
                                   rtol=1e-3)
        assert (h[it + 1:] == -1).all()
        log = format_iteration_log(info, bn)
        lines = log.splitlines()
        assert lines[0].startswith("Iters")
        assert len(lines) == 2 + it
    x, info = gmres(op, b, rtol=1e-6, maxiter=200, logging=1)
    h = np.asarray(info.res_history)
    assert h[0] > 0 and int(info.iterations) >= 1
    assert (h[1:int(info.iterations) + 1] > 0).all()


def test_cogmres_single_reduction_variant():
    # real COGMRES (one fused reduction + Pythagorean norm, cogmres.c):
    # converges like GMRES on the model problem with similar iterations
    from hypre_tpu.krylov import cogmres, gmres
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.seq.ell import ell_spmv

    A = laplacian_2d_5pt(24, 24)
    b = jnp.ones(A.n_rows, A.dtype)
    op = lambda v: ell_spmv(A, v)
    x1, i1 = cogmres(op, b, rtol=1e-8, maxiter=500)
    x2, i2 = gmres(op, b, rtol=1e-8, maxiter=500)
    assert bool(i1.converged) and bool(i2.converged)
    assert abs(int(i1.iterations) - int(i2.iterations)) <= 5
    r = b - op(x1)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-7
    # single-pass (true one-reduction) variant also converges
    x3, i3 = cogmres(op, b, rtol=1e-8, maxiter=500, gs_passes=1)
    assert bool(i3.converged)


def test_lobpcg_interpreted_on_struct_vectors():
    """Multivector interpreter (multivector/interpreter.h analogue):
    LOBPCG over STRUCT-GRID vector pytrees — the operator takes (nx, ny)
    arrays — must find the same smallest eigenvalues as the dense oracle."""
    import numpy as np

    from hypre_tpu.multivector import Interpreter, MultiVector, lobpcg_interpreted
    from hypre_tpu.problems.struct_problems import struct_laplacian
    from hypre_tpu.struct.matrix import struct_matvec

    n = 12
    A = struct_laplacian((n, n))

    def op(v):  # user vectors ARE (n, n) grids
        return struct_matvec(A, v)

    rng = np.random.default_rng(0)
    X0 = MultiVector.from_vectors(
        [jnp.asarray(rng.standard_normal((n, n))) for _ in range(4)]
    )
    w, V, res = lobpcg_interpreted(op, X0, tol=1e-8, maxiter=300)
    dense = np.asarray(A.to_dense())
    want = np.sort(np.linalg.eigvalsh(dense))[:4]
    np.testing.assert_allclose(np.sort(np.asarray(w)), want, rtol=1e-6)
    # vectors come back as grids
    assert V.vectors()[0].shape == (n, n)
