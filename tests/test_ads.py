"""ADS test on a 3-D Raviart-Thomas div-div + mass problem (TEST_ams's
H(div) counterpart; reference driver ``ams_driver.c`` -ads modes)."""

import numpy as np
import jax.numpy as jnp

from hypre_tpu.amg.ads import ADS
from hypre_tpu.krylov import pcg
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import csr_to_ell, ell_from_dense, ell_spmv


def _hex_grid_complex(n=4):
    """Full DeRham complex on an n^3 hex grid: returns (D cellxface,
    C facexedge, G edgexnode, node coords, counts)."""
    nn = n + 1
    node = lambda i, j, k: (i * nn + j) * nn + k

    # edges: x-edges (i in [0,n), j,k in [0,nn)), then y-edges, then z-edges
    nex = n * nn * nn
    ney = nn * n * nn
    xe = lambda i, j, k: (i * nn + j) * nn + k
    ye = lambda i, j, k: nex + (i * n + j) * nn + k
    ze = lambda i, j, k: nex + ney + (i * nn + j) * n + k

    rows, cols, vals = [], [], []
    e = 0
    for i in range(n):            # x-edges: node(i,j,k) -> node(i+1,j,k)
        for j in range(nn):
            for k in range(nn):
                rows += [xe(i, j, k)] * 2
                cols += [node(i + 1, j, k), node(i, j, k)]
                vals += [1.0, -1.0]
    for i in range(nn):           # y-edges
        for j in range(n):
            for k in range(nn):
                rows += [ye(i, j, k)] * 2
                cols += [node(i, j + 1, k), node(i, j, k)]
                vals += [1.0, -1.0]
    for i in range(nn):           # z-edges
        for j in range(nn):
            for k in range(n):
                rows += [ze(i, j, k)] * 2
                cols += [node(i, j, k + 1), node(i, j, k)]
                vals += [1.0, -1.0]
    ne = nex + ney + nn * nn * n
    G = HostCSR.from_coo(rows, cols, vals, (ne, nn**3))

    # faces: x-faces (normal x: i in [0,nn), j,k in [0,n)), then y, then z
    nfx = nn * n * n
    nfy = n * nn * n
    xf = lambda i, j, k: (i * n + j) * n + k
    yf = lambda i, j, k: nfx + (i * nn + j) * n + k
    zf = lambda i, j, k: nfx + nfy + (i * n + j) * nn + k
    rows, cols, vals = [], [], []
    for i in range(nn):           # x-face circulation: y,z edges around it
        for j in range(n):
            for k in range(n):
                f = xf(i, j, k)
                rows += [f] * 4
                cols += [ye(i, j, k), ze(i, j + 1, k), ye(i, j, k + 1), ze(i, j, k)]
                vals += [1.0, 1.0, -1.0, -1.0]
    for i in range(n):            # y-faces: z,x edges
        for j in range(nn):
            for k in range(n):
                f = yf(i, j, k)
                rows += [f] * 4
                cols += [ze(i, j, k), xe(i, j, k + 1), ze(i + 1, j, k), xe(i, j, k)]
                vals += [1.0, 1.0, -1.0, -1.0]
    for i in range(n):            # z-faces: x,y edges
        for j in range(n):
            for k in range(nn):
                f = zf(i, j, k)
                rows += [f] * 4
                cols += [xe(i, j, k), ye(i + 1, j, k), xe(i, j + 1, k), ye(i, j, k)]
                vals += [1.0, 1.0, -1.0, -1.0]
    nf = nfx + nfy + n * n * nn
    C = HostCSR.from_coo(rows, cols, vals, (nf, ne))

    # cells: divergence (out-fluxes +)
    rows, cols, vals = [], [], []
    c = 0
    for i in range(n):
        for j in range(n):
            for k in range(n):
                rows += [c] * 6
                cols += [xf(i + 1, j, k), xf(i, j, k), yf(i, j + 1, k),
                         yf(i, j, k), zf(i, j, k + 1), zf(i, j, k)]
                vals += [1.0, -1.0, 1.0, -1.0, 1.0, -1.0]
                c += 1
    D = HostCSR.from_coo(rows, cols, vals, (n**3, nf))

    coords = np.array(
        [(i, j, k) for i in range(nn) for j in range(nn) for k in range(nn)],
        dtype=float,
    )
    return D, C, G, coords


def test_complex_identities():
    """div(curl) = 0 and curl(grad) = 0 — the discrete DeRham identities
    that AMS/ADS rely on."""
    D, C, G, coords = _hex_grid_complex(3)
    DC = D.to_dense() @ C.to_dense()
    CG = C.to_dense() @ G.to_dense()
    assert np.abs(DC).max() == 0.0
    assert np.abs(CG).max() == 0.0


def test_ads_beats_jacobi_on_div_div():
    """Rough (lognormal) cell/face coefficients spread the spectrum so plain
    CG cannot exploit the two-cluster structure of the constant-coefficient
    problem — the setting ADS is built for (observed here: 1778 Jacobi-PCG
    iterations vs ~38 with ADS)."""
    n, beta = 4, 0.01
    rng = np.random.default_rng(0)
    D, C, G, coords = _hex_grid_complex(n)
    Dd = D.to_dense()
    cc = np.exp(rng.standard_normal(D.shape[0]) * 2.0)
    mm = np.exp(rng.standard_normal(D.shape[1]) * 2.0)
    Ad = Dd.T @ (cc[:, None] * Dd) + beta * np.diag(mm)
    A = ell_from_dense(Ad)
    b = jnp.ones(A.n_rows, A.dtype)
    op = lambda v: ell_spmv(A, v)
    dinv = 1.0 / A.diagonal()
    x0, i0 = pcg(op, b, M=lambda r: dinv * r, rtol=1e-8, maxiter=20000)
    ads = ADS().setup(A, csr_to_ell(C), csr_to_ell(G), coords)
    x1, i1 = pcg(op, b, M=ads.precond(), rtol=1e-8, maxiter=500)
    assert bool(i1.converged), f"{i1}"
    r = b - op(x1)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-6
    assert int(i1.iterations) < int(i0.iterations) / 5, (
        int(i1.iterations),
        int(i0.iterations),
    )
