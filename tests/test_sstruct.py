"""SStruct layer tests (TEST_sstruct analogues: matvec oracle, Split solver
on coupled multi-part problems, SysPFMG on a multi-variable system)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.krylov import gmres, pcg
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.sstruct import SplitSolver, SStructGrid, SysPFMG, SysStructMatrix
from hypre_tpu.sstruct.matrix import SStructGraphBuilder, sstruct_matrix
from hypre_tpu.struct.stencil import star_stencil


def _two_part_problem(n=12):
    """Two n x n parts glued along an edge (hypre ex8-style multipart):
    part boundaries coupled through graph entries so the assembled system
    is the Laplacian on a 2n x n strip."""
    grid = SStructGrid(((n, n), (n, n)))
    parts = [struct_laplacian((n, n)) for _ in range(2)]
    g = SStructGraphBuilder(grid)
    # cells (n-1, j) of part 0 couple to (0, j) of part 1 and vice versa
    for j in range(n):
        g.add_entry(0, (n - 1, j), 1, (0, j), -1.0)
        g.add_entry(1, (0, j), 0, (n - 1, j), -1.0)
    return grid, sstruct_matrix(parts, grid, g)


def test_sstruct_matvec_matches_monolithic():
    n = 8
    grid, A = _two_part_problem(n)
    # oracle: Laplacian on the glued (2n, n) strip; index space differs
    # (part-major vs row-major) so compare through explicit permutation
    mono = struct_laplacian((2 * n, n))
    perm = np.zeros(2 * n * n, dtype=int)  # mono index -> sstruct index
    for i in range(2 * n):
        for j in range(n):
            part, ii = (0, i) if i < n else (1, i - n)
            perm[i * n + j] = grid.global_index(part, (ii, j))
    xm = np.random.default_rng(0).standard_normal(2 * n * n)
    xs = np.empty_like(xm)
    xs[perm] = xm  # mono-ordered values scattered into sstruct ordering
    from hypre_tpu.struct.matrix import struct_matvec

    want = np.asarray(struct_matvec(mono, jnp.asarray(xm.reshape(2 * n, n)))).reshape(-1)
    got = np.asarray(A.mv(jnp.asarray(xs)))
    np.testing.assert_allclose(got[perm], want, atol=1e-12)


def test_split_solver_converges():
    grid, A = _two_part_problem(10)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(A.n_rows))
    sp = SplitSolver().setup(A)
    x, info = sp.solve(b, rtol=1e-8, maxiter=200)
    assert bool(info.converged), f"{info}"
    r = b - A.mv(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-7


def test_split_as_krylov_preconditioner():
    grid, A = _two_part_problem(10)
    b = jnp.ones(A.n_rows)
    x, info = pcg(A.as_linear_op(), b, M=SplitSolver().setup(A).precond(), rtol=1e-8)
    assert bool(info.converged)
    assert int(info.iterations) <= 25


def _coupled_system(n=16, eps=0.1):
    """Two coupled diffusion equations on one part:
    -Δu + eps*v = f1; eps*u - Δv = f2 (SPD for small eps)."""
    L = struct_laplacian((n, n))
    st = L.stencil
    S = st.size
    coeffs = np.zeros((2, 2, S, n, n))
    coeffs[0, 0] = np.asarray(jnp.broadcast_to(L.coeffs[:, None, None], (S, n, n)))
    coeffs[1, 1] = coeffs[0, 0]
    ci = st.center_index()
    coeffs[0, 1, ci] = eps
    coeffs[1, 0, ci] = eps
    return SysStructMatrix(coeffs=jnp.asarray(coeffs), stencil=st, shape=(n, n))


def test_sys_matvec_vs_dense():
    A = _coupled_system(5)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 5, 5)))
    dense = np.asarray(A.to_dense())
    np.testing.assert_allclose(
        np.asarray(A.mv(x)).reshape(-1), dense @ np.asarray(x).reshape(-1), atol=1e-12
    )


def test_syspfmg_solve():
    A = _coupled_system(16)
    b = jnp.asarray(np.random.default_rng(3).standard_normal((2, 16, 16)))
    sp = SysPFMG(max_coarse_size=128).setup(A)
    x, info = sp.solve(b, rtol=1e-7, maxiter=100)
    assert bool(info.converged), f"{info}"
    r = b - A.mv(x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-6
    assert int(info.iterations) <= 30


def test_syspfmg_as_preconditioner():
    A = _coupled_system(12)
    sp = SysPFMG(max_coarse_size=64).setup(A)
    b = jnp.ones(A.n_rows)
    x, info = pcg(A.as_linear_op(), b, M=sp.precond(), rtol=1e-8, maxiter=60)
    assert bool(info.converged)
    assert int(info.iterations) <= 15


def test_fac_composite_poisson():
    """FAC on a composite AMR grid (sstruct_ls/fac*.c analogue): a 12x12
    coarse grid with a 2x-refined central patch, conservative interface
    fluxes. FAC must converge fast standalone and match the dense solve."""
    import numpy as np

    from hypre_tpu.sstruct.fac import FAC, composite_poisson_2d
    from hypre_tpu.seq.ell import ell_spmv, ell_to_csr

    A, fine_mask, parent, (nfine, n) = composite_poisson_2d(
        12, (4, 4), (8, 8)
    )
    fac = FAC().setup(A, fine_mask, parent)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n))
    x, info = fac.solve(b, rtol=1e-8, maxiter=60)
    assert bool(info.converged), f"{info}"
    r = b - ell_spmv(A, x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-7
    assert int(info.iterations) <= 30
    want = np.linalg.solve(ell_to_csr(A).to_dense(), np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-5, atol=1e-7)


def test_fac_as_pcg_preconditioner():
    import numpy as np

    from hypre_tpu.sstruct.fac import FAC, composite_poisson_2d
    from hypre_tpu.seq.ell import ell_spmv

    A, fine_mask, parent, _ = composite_poisson_2d(10, (3, 3), (7, 7))
    fac = FAC().setup(A, fine_mask, parent)
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = pcg(lambda v: ell_spmv(A, v), b, M=fac.precond(), rtol=1e-8)
    assert bool(info.converged)
    assert int(info.iterations) <= 15


# ---------------------------------------------------------------------------
# Maxwell (sstruct_ls/maxwell_*.c analogue)
# ---------------------------------------------------------------------------


def _curl_curl_edges(nx, ny, beta=0.01):
    """2-D edge curl-curl + beta*mass in the maxwell_grad edge ordering
    (x-edges direction-major lexicographic, then y-edges)."""
    import numpy as np
    from hypre_tpu.seq.csr import HostCSR
    from hypre_tpu.seq.ell import ell_from_dense

    x_edges = nx * (ny + 1)

    def xe(i, j):
        return i * (ny + 1) + j

    def ye(i, j):
        return x_edges + i * ny + j

    ne = x_edges + (nx + 1) * ny
    crows, ccols, cvals = [], [], []
    c = 0
    for i in range(nx):
        for j in range(ny):
            for e, s in [(xe(i, j), 1.0), (ye(i + 1, j), 1.0),
                         (xe(i, j + 1), -1.0), (ye(i, j), -1.0)]:
                crows.append(c)
                ccols.append(e)
                cvals.append(s)
            c += 1
    C = HostCSR.from_coo(crows, ccols, np.asarray(cvals), (c, ne)).to_dense()
    return ell_from_dense(C.T @ C + beta * np.eye(ne))


def test_maxwell_grad_matches_hand_built_gradient():
    import numpy as np
    from hypre_tpu.sstruct.grid import SStructGrid
    from hypre_tpu.sstruct.maxwell import maxwell_grad, part_edge_counts
    from hypre_tpu.seq.ell import ell_to_csr

    nx, ny = 3, 4
    grid = SStructGrid(part_shapes=(((nx + 1), (ny + 1)),))
    G, coords = maxwell_grad(grid)
    assert part_edge_counts((nx + 1, ny + 1)) == [nx * (ny + 1), (nx + 1) * ny]
    Gd = ell_to_csr(G).to_dense()
    # x-edge (i,j): +1 at node(i+1,j), -1 at node(i,j)
    node = lambda i, j: i * (ny + 1) + j
    for i in range(nx):
        for j in range(ny + 1):
            e = i * (ny + 1) + j
            assert Gd[e, node(i + 1, j)] == 1.0 and Gd[e, node(i, j)] == -1.0
    # every row sums to zero (gradient of constants vanishes)
    np.testing.assert_allclose(Gd.sum(axis=1), 0.0)
    np.testing.assert_allclose(coords[node(2, 3)], [2.0, 3.0])


def test_maxwell_beats_jacobi_on_curl_curl():
    from hypre_tpu.krylov.pcg import pcg
    from hypre_tpu.seq.ell import ell_spmv
    from hypre_tpu.sstruct.grid import SStructGrid
    from hypre_tpu.sstruct.maxwell import Maxwell

    nx = ny = 8
    A = _curl_curl_edges(nx, ny, beta=0.01)
    grid = SStructGrid(part_shapes=((nx + 1, ny + 1),))
    b = jnp.ones(A.n_rows, A.dtype)
    mx = Maxwell(amg_knobs=dict(max_coarse_size=40)).setup(A, grid)
    x, info = mx.solve(b, rtol=1e-8, maxiter=200)
    assert bool(info.converged)
    dinv = 1.0 / A.diagonal()
    _, ij = pcg(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r,
                rtol=1e-8, maxiter=2000)
    assert int(info.iterations) < int(ij.iterations) // 2


def test_maxwell_two_part_grid():
    import numpy as np
    from hypre_tpu.seq.ell import ell_from_dense, ell_to_csr
    from hypre_tpu.sstruct.grid import SStructGrid
    from hypre_tpu.sstruct.maxwell import Maxwell

    n1, n2 = 4, 3
    A1 = _curl_curl_edges(n1, n1, beta=0.05)
    A2 = _curl_curl_edges(n2, n2, beta=0.05)
    d1 = np.asarray(ell_to_csr(A1).to_dense())
    d2 = np.asarray(ell_to_csr(A2).to_dense())
    blk = np.block([
        [d1, np.zeros((d1.shape[0], d2.shape[1]))],
        [np.zeros((d2.shape[0], d1.shape[1])), d2],
    ])
    grid = SStructGrid(part_shapes=((n1 + 1, n1 + 1), (n2 + 1, n2 + 1)))
    A = ell_from_dense(blk)
    mx = Maxwell(rfactors=(1.0, 2.0), amg_knobs=dict(max_coarse_size=40))
    mx.setup(A, grid)
    b = jnp.ones(A.n_rows, A.dtype)
    x, info = mx.solve(b, rtol=1e-8, maxiter=300)
    assert bool(info.converged)


def test_sstruct_fem_addfemvalues_two_parts():
    # HYPRE_SStructMatrixAddFEMValues semantics (HYPRE_sstruct_matrix.c:361)
    # + shared-node identification across parts: two Q1-meshed parts glued
    # along an edge assemble to the same system as one combined mesh
    import numpy as np

    from hypre_tpu.krylov import pcg
    from hypre_tpu.seq.ell import ell_spmv
    from hypre_tpu.sstruct.fem import SStructFEMGrid, SStructFEMMatrix

    ke = np.array([
        [ 2/3, -1/6, -1/3, -1/6],
        [-1/6,  2/3, -1/6, -1/3],
        [-1/3, -1/6,  2/3, -1/6],
        [-1/6, -1/3, -1/6,  2/3],
    ])
    n = 6  # elements per part (parts stacked left-right: combined 2n x n)
    grid = SStructFEMGrid([(n + 1, n + 1), (n + 1, n + 1)])
    for p in (0, 1):
        grid.set_fem_ordering(
            p, [0, 0, 0, 0], [(0, 0), (1, 0), (1, 1), (0, 1)]
        )
    # part 1's left node column is part 0's right column
    for j in range(n + 1):
        grid.share_node(1, (0, j), 0, (n, j))

    M = SStructFEMMatrix(grid)
    fe = np.full(4, 0.25 / (2 * n * n))
    for p in (0, 1):
        for i in range(n):
            for j in range(n):
                M.add_fem_values(p, (i, j), ke)
                M.add_fem_rhs(p, (i, j), fe)
    # Dirichlet on the combined outer boundary
    bnd = set()
    for j in range(n + 1):
        bnd.add(grid.dof(0, (0, j), 0))
        bnd.add(grid.dof(1, (n, j), 0))
    for p in (0, 1):
        for i in range(n + 1):
            bnd.add(grid.dof(p, (i, 0), 0))
            bnd.add(grid.dof(p, (i, n), 0))
    M.assemble(dirichlet=sorted(bnd))
    assert grid.n_dofs == (2 * n + 1) * (n + 1)

    x, info = pcg(
        lambda v: ell_spmv(M.A, v), M.b,
        M=lambda r: r / M.A.diagonal(), rtol=1e-10,
    )
    assert bool(info.converged)
    xs = np.asarray(x)
    assert xs.max() > 0 and xs.min() >= -1e-10
    # the shared column carries the interface solution (interior > 0)
    mid = grid.dof(0, (n, n // 2), 0)
    assert xs[mid] > 0


def test_syspfmg_node_relax_strong_coupling():
    """node_relax.c analogue: nodal block relaxation solves the coupled
    nvars x nvars system per grid point; on a strongly coupled system it
    must beat pointwise Jacobi, which barely damps the coupling."""
    # strong node coupling, SPD overall: -Δu + 3u + 2.9v, 2.9u - Δv + 3v
    # (node blocks [[c+3, 2.9], [2.9, c+3]]; system eigenvalues
    # λ(L) + 3 ± 2.9 > 0)
    A0 = _coupled_system(16, eps=2.9)
    ci = A0.stencil.center_index()
    coeffs = np.asarray(A0.coeffs).copy()
    coeffs[0, 0, ci] += 3.0
    coeffs[1, 1, ci] += 3.0
    A = SysStructMatrix(
        coeffs=jnp.asarray(coeffs), stencil=A0.stencil, shape=A0.shape
    )
    b = jnp.asarray(np.random.default_rng(5).standard_normal((2, 16, 16)))
    it = {}
    for relax in ("jacobi", "node-jacobi", "node-rbgs"):
        sp = SysPFMG(max_coarse_size=128, relax_type=relax).setup(A)
        x, info = sp.solve(b, rtol=1e-7, maxiter=200)
        if bool(info.converged):
            r = b - A.mv(x)
            assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-6
        it[relax] = int(info.iterations) if bool(info.converged) else 999
    assert it["node-jacobi"] <= 100
    assert it["node-rbgs"] <= it["node-jacobi"]
    assert it["node-jacobi"] < it["jacobi"]


def test_fac_multilevel_nested_patches():
    """Multi-level FAC (hypre fac_cycle.c recursion over nested AMR
    levels): a 10x10 base grid with a 2x patch and a further 2x patch
    nested inside it. The 3-level composite solve must converge fast and
    match the dense solution."""
    import numpy as np

    from hypre_tpu.sstruct.fac import FAC, composite_poisson_nested
    from hypre_tpu.seq.ell import ell_spmv, ell_to_csr

    A, masks, parents, n = composite_poisson_nested(
        10, [((2, 2), (8, 8)), ((4, 4), (6, 6))]
    )
    # operator sanity: symmetric M-matrix with positive diagonal
    D = ell_to_csr(A).to_dense()
    np.testing.assert_allclose(D, D.T, atol=1e-12)
    assert (np.diag(D) > 0).all()

    fac = FAC().setup(A, masks, parents)
    assert len(fac.levels) == 2
    b = jnp.asarray(np.random.default_rng(7).standard_normal(n))
    x, info = fac.solve(b, rtol=1e-8, maxiter=80)
    assert bool(info.converged), f"{info}"
    r = b - ell_spmv(A, x)
    assert float(jnp.linalg.norm(r) / jnp.linalg.norm(b)) < 1e-7
    assert int(info.iterations) <= 40
    want = np.linalg.solve(D, np.asarray(b))
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-5, atol=1e-6)
