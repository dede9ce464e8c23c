"""MGR and AMS tests (TEST_ij solver ids 70-74 and TEST_ams analogues)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hypre_tpu import laplacian_2d_5pt
from hypre_tpu.amg.ams import AMS
from hypre_tpu.amg.mgr import MGR
from hypre_tpu.krylov import gmres, pcg
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import csr_to_ell, ell_spmv


# ---------------------------------------------------------------------------
# MGR
# ---------------------------------------------------------------------------


def test_mgr_solves_laplacian():
    """MGR with every-other-point C-selection on the Laplacian — a pure
    reduction hierarchy must still converge as a solver."""
    n = 16
    A = laplacian_2d_5pt(n, n)
    cpts0 = np.nonzero((np.arange(n * n) // n + np.arange(n * n) % n) % 2 == 0)[0]
    mgr = MGR().setup(A, [cpts0])
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = mgr.solve(b, rtol=1e-8, maxiter=100)
    assert bool(info.converged), f"{info}"
    r = b - ell_spmv(A, x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-7


def _block_system(n=10, eps=1e-3):
    """2x2 block system [[A, B],[B^T, eps*I]] — pressure-like second block
    (the CPR/reservoir shape MGR targets, par_mgr.c:3798)."""
    rng = np.random.default_rng(0)
    lap = laplacian_2d_5pt(n, n)
    from hypre_tpu.seq.ell import ell_to_csr

    Ad = ell_to_csr(lap).to_dense()
    m = n * n
    Bd = np.zeros((m, m))
    idx = np.arange(m)
    Bd[idx, idx] = 0.1
    Bd[idx[:-1], idx[1:]] = 0.05
    S = np.block([[Ad, Bd], [Bd.T, Ad * 0 + np.eye(m) * 4.0]])
    from hypre_tpu.seq.ell import ell_from_dense

    return ell_from_dense(S), m


def test_mgr_as_gmres_preconditioner_block_system():
    A, m = _block_system()
    # coarse grid = the second (pressure) block, hypre SetCpointsByBlock
    cpts = np.arange(m, 2 * m)
    mgr = MGR(num_relax_sweeps=2).setup(A, [cpts])
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = gmres(lambda v: ell_spmv(A, v), b, M=mgr.precond(), rtol=1e-8, maxiter=200)
    assert bool(info.converged)
    x0, info0 = gmres(lambda v: ell_spmv(A, v), b, rtol=1e-8, maxiter=500)
    assert int(info.iterations) < int(info0.iterations)


# ---------------------------------------------------------------------------
# AMS
# ---------------------------------------------------------------------------


def _curl_curl_2d(nx=10, ny=10, beta=0.01):
    """2-D edge-element curl-curl + beta*mass on a rectangular grid
    (the ex15-style AMS test problem) with its discrete gradient and
    node coordinates."""
    nnode = (nx + 1) * (ny + 1)
    node = lambda i, j: i * (ny + 1) + j
    edges = []  # (tail, head)
    for i in range(nx):  # x-directed edges
        for j in range(ny + 1):
            edges.append((node(i, j), node(i + 1, j)))
    x_edge_count = len(edges)
    for i in range(nx + 1):  # y-directed edges
        for j in range(ny):
            edges.append((node(i, j), node(i, j + 1)))
    ne = len(edges)
    # discrete gradient: G[e, head] = 1, G[e, tail] = -1
    rows, cols, vals = [], [], []
    for e, (t, h) in enumerate(edges):
        rows += [e, e]
        cols += [h, t]
        vals += [1.0, -1.0]
    G = HostCSR.from_coo(rows, cols, vals, (ne, nnode))
    # curl: per cell, circulation over its 4 edges
    def xe(i, j):
        return i * (ny + 1) + j

    def ye(i, j):
        return x_edge_count + i * ny + j

    crows, ccols, cvals = [], [], []
    c = 0
    for i in range(nx):
        for j in range(ny):
            for e, s in [
                (xe(i, j), 1.0),
                (ye(i + 1, j), 1.0),
                (xe(i, j + 1), -1.0),
                (ye(i, j), -1.0),
            ]:
                crows.append(c)
                ccols.append(e)
                cvals.append(s)
            c += 1
    C = HostCSR.from_coo(crows, ccols, cvals, (c, ne))
    Cd = C.to_dense()
    Ad = Cd.T @ Cd + beta * np.eye(ne)
    coords = np.array(
        [(i, j) for i in range(nx + 1) for j in range(ny + 1)], dtype=float
    )
    from hypre_tpu.seq.ell import ell_from_dense

    return ell_from_dense(Ad), csr_to_ell(G), coords


def test_ams_beats_jacobi_on_curl_curl():
    A, G, coords = _curl_curl_2d(10, 10, beta=0.01)
    b = jnp.ones(A.n_rows, A.dtype)
    op = lambda v: ell_spmv(A, v)
    dinv = 1.0 / A.diagonal()
    x0, i0 = pcg(op, b, M=lambda r: dinv * r, rtol=1e-8, maxiter=2000)
    ams = AMS().setup(A, G, coords)
    x1, i1 = pcg(op, b, M=ams.precond(), rtol=1e-8, maxiter=2000)
    assert bool(i1.converged)
    r = b - op(x1)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-6
    assert int(i1.iterations) < int(i0.iterations) / 3, (
        int(i1.iterations),
        int(i0.iterations),
    )


def test_mgr_global_ilu_smoothing_halves_iterations():
    """CPR-style MGR (HYPRE_MGRSetGlobalSmoothType, par_mgr.c): a global
    ILU pass on the full system each cycle handles the coupling the
    reduction lags. Measured: FlexGMRES 20 iters bare -> 10 with global
    ILU on the block system."""
    from hypre_tpu.krylov import flexgmres

    A, m = _block_system(12)
    cpts = [np.arange(m, 2 * m)]
    b = jnp.ones(A.n_rows, A.dtype)

    def iters(**kw):
        mgr = MGR(**kw).setup(A, cpts)
        _, info = flexgmres(lambda v: ell_spmv(A, v), b, M=mgr.precond(),
                            rtol=1e-8, maxiter=200)
        assert bool(info.converged)
        return int(info.iterations)

    bare = iters()
    cpr = iters(global_smooth_type="ilu")
    assert cpr < bare, (cpr, bare)
    assert cpr <= 12
