"""Krylov solver tests against direct solves and hypre-style goldens.

hypre validates solvers by iteration count + final relative residual
(``TEST_ij/solvers.saved``); we do the same: each solver must converge to the
requested rtol within a budget comparable to hypre's golden counts for the
same problem class, and the returned solution must match a dense direct solve.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hypre_tpu.krylov import pcg, gmres, bicgstab
from hypre_tpu.problems.laplacian import laplacian_2d_5pt, difconv_3d_7pt
from hypre_tpu.seq.ell import ell_spmv, ell_to_csr


@pytest.fixture(scope="module")
def lap2d():
    A = laplacian_2d_5pt(20, 20)
    rng = np.random.default_rng(0)
    x_true = jnp.asarray(rng.standard_normal(400))
    b = ell_spmv(A, x_true)
    return A, b, x_true


class TestPCG:
    def test_converges_to_direct_solution(self, lap2d):
        A, b, x_true = lap2d
        x, info = jax.jit(lambda b: pcg(lambda v: ell_spmv(A, v), b, rtol=1e-10))(b)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-7)

    def test_diag_precond_reduces_iterations(self, lap2d):
        A, b, _ = lap2d
        dinv = 1.0 / A.diagonal()
        op = lambda v: ell_spmv(A, v)
        _, plain = pcg(op, b, rtol=1e-8)
        _, prec = pcg(op, b, M=lambda r: dinv * r, rtol=1e-8)
        assert bool(prec.converged) and bool(plain.converged)
        # 5-pt Laplacian has constant diagonal: same count expected, never worse
        assert int(prec.iterations) <= int(plain.iterations)

    def test_energy_norm_mode(self, lap2d):
        A, b, x_true = lap2d
        x, info = pcg(lambda v: ell_spmv(A, v), b, rtol=1e-10, two_norm=False)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-7)

    def test_zero_rhs(self, lap2d):
        A, _, _ = lap2d
        x, info = pcg(lambda v: ell_spmv(A, v), jnp.zeros(400))
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(x), 0.0)

    def test_maxiter_reports_nonconvergence(self, lap2d):
        A, b, _ = lap2d
        _, info = pcg(lambda v: ell_spmv(A, v), b, rtol=1e-12, maxiter=3)
        assert not bool(info.converged)
        assert int(info.iterations) == 3

    def test_ds_pcg_iteration_golden(self):
        """DS-PCG (diagonal-scaled) on the 5-pt Laplacian — the solver class
        behind TEST_ij case 1 (41 iters on hypre's grid). On our 20x20 grid
        the count must be stable and modest."""
        A = laplacian_2d_5pt(20, 20)
        b = jnp.ones(400)
        dinv = 1.0 / A.diagonal()
        _, info = pcg(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r, rtol=1e-8)
        assert bool(info.converged)
        assert int(info.iterations) <= 60
        assert float(info.relative_residual) <= 1e-8


class TestGMRES:
    def test_spd_problem(self, lap2d):
        A, b, x_true = lap2d
        x, info = jax.jit(
            lambda b: gmres(lambda v: ell_spmv(A, v), b, rtol=1e-10, k_dim=30)
        )(b)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-6)

    def test_nonsymmetric_difconv(self):
        A = difconv_3d_7pt(6, 6, 6, cx=2.0, cy=1.0)
        rng = np.random.default_rng(1)
        x_true = jnp.asarray(rng.standard_normal(216))
        b = ell_spmv(A, x_true)
        x, info = gmres(lambda v: ell_spmv(A, v), b, rtol=1e-10, k_dim=40)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), rtol=1e-5, atol=1e-6)

    def test_restart_path(self, lap2d):
        A, b, x_true = lap2d
        # k_dim much smaller than iteration need forces restarts
        x, info = gmres(lambda v: ell_spmv(A, v), b, rtol=1e-8, k_dim=10, maxiter=2000)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-5)

    def test_diag_preconditioned(self):
        A = difconv_3d_7pt(6, 6, 6, cx=4.0)
        dinv = 1.0 / A.diagonal()
        b = jnp.ones(216)
        x, info = gmres(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r, rtol=1e-9)
        assert bool(info.converged)
        r = b - ell_spmv(A, x)
        assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-7


class TestBiCGSTAB:
    def test_spd_problem(self, lap2d):
        A, b, x_true = lap2d
        x, info = jax.jit(lambda b: bicgstab(lambda v: ell_spmv(A, v), b, rtol=1e-10))(b)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), atol=1e-6)

    def test_nonsymmetric(self):
        A = difconv_3d_7pt(6, 6, 6, cx=2.0)
        rng = np.random.default_rng(2)
        x_true = jnp.asarray(rng.standard_normal(216))
        b = ell_spmv(A, x_true)
        x, info = bicgstab(lambda v: ell_spmv(A, v), b, rtol=1e-10)
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_true), rtol=1e-5, atol=1e-6)
