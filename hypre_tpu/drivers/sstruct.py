"""``sstruct`` test driver — the semi-structured analogue of ``ij``/``struct``
(reference: ``src/test/sstruct.c`` and the TEST_sstruct golden suite).

Default problem: two n x n parts glued along an edge through graph entries
(the ``sstruct.in.default``/ex8 multipart pattern), assembled as parts +
U-matrix. Solver numbering follows sstruct.c's ids where a TPU analogue
exists:

  10  PCG + Split(SMG-per-part) preconditioner
  11  PCG + Split(PFMG-per-part) preconditioner
  20  Split standalone (block-diagonal per-part MG, U couplings lagged)
  3   SysPFMG standalone on a two-variable coupled diffusion system
      (sys_pfmg*.c; -eps sets the inter-variable coupling)
  28  FAC standalone on a composite AMR Poisson grid with a 2x-refined
      central patch (fac*.c)
  120 AMS-based Maxwell on the 2-D edge curl-curl system (maxwell_*.c;
      -beta sets the mass shift)

Prints the same two summary lines the other drivers (and hypre's) emit so
golden tables diff uniformly.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np


def _two_part_problem(n, dtype=None):
    from hypre_tpu.problems.struct_problems import struct_laplacian
    from hypre_tpu.sstruct import SStructGrid
    from hypre_tpu.sstruct.matrix import SStructGraphBuilder, sstruct_matrix

    grid = SStructGrid(((n, n), (n, n)))
    parts = [struct_laplacian((n, n), dtype=dtype) for _ in range(2)]
    g = SStructGraphBuilder(grid)
    for j in range(n):
        g.add_entry(0, (n - 1, j), 1, (0, j), -1.0)
        g.add_entry(1, (0, j), 0, (n - 1, j), -1.0)
    return grid, sstruct_matrix(parts, grid, g)


def _coupled_system(n, eps):
    from hypre_tpu.problems.struct_problems import struct_laplacian
    from hypre_tpu.sstruct.syspfmg import SysStructMatrix

    L = struct_laplacian((n, n))
    st = L.stencil
    S = st.size
    coeffs = np.zeros((2, 2, S, n, n))
    coeffs[0, 0] = np.asarray(
        jnp.broadcast_to(L.coeffs[:, None, None], (S, n, n))
    )
    coeffs[1, 1] = coeffs[0, 0]
    ci = st.center_index()
    coeffs[0, 1, ci] = eps
    coeffs[1, 0, ci] = eps
    return SysStructMatrix(coeffs=jnp.asarray(coeffs), stencil=st, shape=(n, n))


def _curl_curl(n, beta):
    from hypre_tpu.seq.csr import HostCSR
    from hypre_tpu.seq.ell import ell_from_dense

    nx = ny = n
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


def run(argv: list[str]) -> tuple[int, float]:
    a = dict(solver=10, n=16, tol=1e-6, max_iter=200, eps=0.1, beta=0.05)
    i = 0
    while i < len(argv):
        f = argv[i]

        def take():
            nonlocal i
            i += 1
            return argv[i]

        if f == "-solver":
            a["solver"] = int(take())
        elif f == "-n":
            a["n"] = int(take())
        elif f == "-tol":
            a["tol"] = float(take())
        elif f == "-max_iter":
            a["max_iter"] = int(take())
        elif f == "-eps":
            a["eps"] = float(take())
        elif f == "-beta":
            a["beta"] = float(take())
        elif f == "-help":
            print(__doc__)
            raise SystemExit(0)
        i += 1

    from hypre_tpu.krylov import pcg
    from hypre_tpu.sstruct import FAC, Maxwell, SplitSolver, SysPFMG

    s, n, tol, mx = a["solver"], a["n"], a["tol"], a["max_iter"]
    rng = np.random.default_rng(0)

    if s in (10, 11, 20):
        grid, A = _two_part_problem(n)
        b = jnp.asarray(rng.standard_normal(A.n_rows), A.dtype)
        if s == 20:
            sp = SplitSolver().setup(A)
            x, info = sp.solve(b, rtol=tol, maxiter=mx)
        else:
            sp = SplitSolver(solver="smg" if s == 10 else "pfmg").setup(A)
            x, info = pcg(A.as_linear_op(), b, M=sp.precond(), rtol=tol,
                          maxiter=mx)
    elif s == 3:
        A = _coupled_system(n, a["eps"])
        b = jnp.asarray(rng.standard_normal((2, n, n)), A.dtype)
        x, info = SysPFMG(max_coarse_size=128).setup(A).solve(
            b, rtol=tol, maxiter=mx
        )
    elif s == 28:
        from hypre_tpu.sstruct.fac import composite_poisson_2d

        q = max(n // 3, 2)
        A, fine_mask, parent, (_, ntot) = composite_poisson_2d(
            n, (q, q), (2 * q, 2 * q)
        )
        b = jnp.asarray(rng.standard_normal(ntot), A.dtype)
        x, info = FAC().setup(A, fine_mask, parent).solve(
            b, rtol=tol, maxiter=mx
        )
    elif s == 120:
        from hypre_tpu.sstruct import SStructGrid

        A = _curl_curl(n, a["beta"])
        grid = SStructGrid(((n + 1, n + 1),))  # node dims: n x n cells
        b = jnp.asarray(rng.standard_normal(A.n_rows), A.dtype)
        mw = Maxwell().setup(A, grid)
        x, info = mw.solve(b, rtol=tol, maxiter=mx)
    else:
        raise SystemExit(f"unknown -solver {s}")

    iters = int(info.iterations)
    rel = float(info.relative_residual)
    print(f"Iterations = {iters}")
    print(f"Final Relative Residual Norm = {rel:.6e}")
    return iters, rel


def main() -> None:
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
