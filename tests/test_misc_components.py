"""Tests for the smaller components: non-Galerkin sparsification, AME,
BlockTridiag, the distributed-matrix facade, timing registry."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu import laplacian_2d_5pt, laplacian_3d_7pt
from hypre_tpu.amg import BoomerAMG
from hypre_tpu.krylov import pcg
from hypre_tpu.seq.ell import ell_spmv


def test_nongalerkin_sparsification():
    A = laplacian_3d_7pt(24, 24, 24)
    amg0 = BoomerAMG().setup(A, optimize=False)
    amg1 = BoomerAMG(nongalerkin_tol=0.02).setup(A, optimize=False)
    assert len(amg1.hierarchy.levels) >= 2
    k0 = amg0.hierarchy.levels[1].A.k
    k1 = amg1.hierarchy.levels[1].A.k
    assert k1 < k0, f"sparsification did not shrink coarse stencil: {k1} vs {k0}"
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = pcg(lambda v: ell_spmv(A, v), b, M=amg1.precond(), rtol=1e-8, maxiter=60)
    assert bool(info.converged)
    assert int(info.iterations) <= 15


def test_ame_maxwell_eigen():
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mgr_ams import _curl_curl_2d

    from hypre_tpu.amg.ame import AME

    beta = 0.05
    A, G, coords = _curl_curl_2d(8, 8, beta=beta)
    ame = AME(block_size=3, tol=1e-6, maxiter=150).setup(A, G, coords)
    lam, X, rn = ame.solve(seed=3)
    # oracle: eigenvalues of A restricted to the divergence-free complement
    # = nonzero curl-curl eigenvalues + beta
    from hypre_tpu.seq.ell import ell_to_csr

    Ad = ell_to_csr(A).to_dense()
    Gd = ell_to_csr(G).to_dense()
    w, V = np.linalg.eigh(Ad)
    # gradient-space eigenvalues cluster at ~beta (curl-free); AME's targets
    # are the smallest NON-gradient ones. Compute them by deflation:
    U, sv, _ = np.linalg.svd(Gd, full_matrices=False)
    Q = U[:, sv > 1e-10 * sv.max()]  # orthonormal basis of range(G) only
    P = np.eye(Ad.shape[0]) - Q @ Q.T
    wd = np.linalg.eigvalsh(P @ Ad @ P)
    want = np.sort(wd[wd > beta * 1.5])[:3]
    got = np.sort(np.asarray(lam))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_block_tridiag_preconditioner():
    from hypre_tpu.amg.block_tridiag import BlockTridiag

    n = 20
    A = laplacian_2d_5pt(n, n)
    bt = BlockTridiag().setup(A, np.arange(n * n // 2))
    b = jnp.ones(A.n_rows, A.dtype)
    from hypre_tpu.krylov import gmres

    x, info = gmres(lambda v: ell_spmv(A, v), b, M=bt.precond(), rtol=1e-8)
    assert bool(info.converged)
    assert int(info.iterations) <= 20


def test_distributed_matrix_facade():
    from hypre_tpu.matrix_facade import convert_to_distributed

    A = laplacian_2d_5pt(5, 5)
    D = convert_to_distributed(A)
    assert D.shape == (25, 25)
    cols, vals = D.get_row(12)  # interior point
    assert len(cols) == 5 and np.isclose(vals.sum(), 0.0)
    total = sum(len(c) for _, c, _ in D.rows())
    from hypre_tpu.seq.ell import ell_to_csr

    assert total == ell_to_csr(A).nnz


def test_timing_registry():
    from hypre_tpu.core.timing import TimerRegistry

    reg = TimerRegistry()
    with reg.time("setup"):
        sum(range(1000))
    with reg.time("setup"):
        sum(range(1000))
    rep = reg.report()
    assert "setup" in rep and reg._count["setup"] == 2


def test_gsmg_solves_laplacian():
    """GSMG (par_gsmg.c, driver solvers 13-15): smoothed-vector LS
    interpolation must give a working hierarchy on the Laplacian."""
    from hypre_tpu.amg.gsmg import GSMG

    A = laplacian_2d_5pt(32, 32)
    gs = GSMG(max_coarse_size=64)
    gs.setup(A, optimize=False)
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = pcg(lambda v: ell_spmv(A, v), b, M=gs.precond(), rtol=1e-8, maxiter=60)
    assert bool(info.converged), f"{info}"
    assert int(info.iterations) <= 20


def test_error_flag_system():
    # HYPRE_utilities.h:106-140 surface: bit-coded flags, arg encoding,
    # describe, clear; CONV recorded from unconverged solves
    from hypre_tpu.core import error as E

    E.clear_all_errors()
    assert E.get_error() == 0
    E.set_error(E.HYPRE_ERROR_GENERIC)
    E.set_error_arg(E.HYPRE_ERROR_ARG, 3)
    ierr = E.get_error()
    assert E.check_error(ierr, E.HYPRE_ERROR_GENERIC)
    assert E.check_error(ierr, E.HYPRE_ERROR_ARG)
    assert E.get_error_arg() == 3
    assert "argument 3" in E.describe_error(ierr)
    E.clear_all_errors()

    # an unconverged Krylov solve flags CONV without raising
    import jax.numpy as jnp

    from hypre_tpu.krylov import pcg
    from hypre_tpu.problems.laplacian import laplacian_2d_5pt
    from hypre_tpu.seq.ell import ell_spmv

    A = laplacian_2d_5pt(16, 16)
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = pcg(lambda v: ell_spmv(A, v), b, rtol=1e-12, maxiter=2)
    E.record_convergence(info)
    assert E.check_error(E.get_error(), E.HYPRE_ERROR_CONV)
    assert "did not converge" in E.describe_error(E.get_error())
    E.clear_all_errors()


@pytest.mark.slow
def test_ame_f32_host_path():
    # f32 robustness: the host-f64 LOBPCG outer loop (device f32 AMS
    # preconditioning) must recover the same divergence-free eigenvalues
    # the x64 oracle gives, from an f32 operator
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_mgr_ams import _curl_curl_2d

    import dataclasses as dc

    from hypre_tpu.amg.ame import AME
    from hypre_tpu.seq.ell import EllMatrix, ell_to_csr

    beta = 0.05
    A, G, coords = _curl_curl_2d(6, 6, beta=beta)
    A32 = EllMatrix(vals=A.vals.astype(jnp.float32), cols=A.cols,
                    n_cols=A.n_cols)
    G32 = EllMatrix(vals=G.vals.astype(jnp.float32), cols=G.cols,
                    n_cols=G.n_cols)
    ame = AME(block_size=2, tol=3e-4, maxiter=30).setup(A32, G32, coords)
    lam, X, rn = ame.solve(seed=3)  # host_f64 auto-on for f32

    Ad = ell_to_csr(A).to_dense()
    Gd = ell_to_csr(G).to_dense()
    U, sv, _ = np.linalg.svd(Gd, full_matrices=False)
    Q = U[:, sv > 1e-10 * sv.max()]
    P = np.eye(Ad.shape[0]) - Q @ Q.T
    wd = np.linalg.eigvalsh(P @ Ad @ P)
    want = np.sort(wd[wd > beta * 1.5])[:2]
    got = np.sort(np.asarray(lam, np.float64))
    # f32 operator entries limit agreement to ~1e-3 relative
    np.testing.assert_allclose(got, want, rtol=2e-3)


def test_hbm_memory_model():
    """core/memory.py: pressure guard + tracker (utilities/memory.h
    tracker analogue; the round-2 27-pt OOM had no pre-dispatch guard)."""
    import pytest

    from hypre_tpu.core import memory as mem

    limit = mem.hbm_bytes_limit()
    assert limit >= 2**30
    mem.check_hbm_request(1024)  # tiny: fine
    with pytest.raises(MemoryError):
        mem.check_hbm_request(100 * limit)
    assert mem.slab_element_budget() > 1e6
    with mem.track_hbm() as rep:
        import jax.numpy as jnp

        x = jnp.ones((1024, 1024), jnp.float32) * 2.0
        x.block_until_ready()
    assert rep.end_bytes >= 0 and rep.peak_bytes >= rep.end_bytes - 1
