"""ex8 analogue (src/examples/ex8.c): a THREE-part semi-structured problem
where two parts carry a 5-point stencil and one a 9-point stencil, glued
through inter-part graph entries, solved with the Split solver as a GMRES
preconditioner."""

import jax.numpy as jnp
import numpy as np

from hypre_tpu.krylov import gmres
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.sstruct import SplitSolver, SStructGrid
from hypre_tpu.sstruct.matrix import SStructGraphBuilder, sstruct_matrix
from hypre_tpu.struct.matrix import struct_from_dense_coeffs


def main(n=12):
    lap9 = {
        (0, 0): 8.0 / 3.0,
        (-1, 0): -1.0 / 3.0, (1, 0): -1.0 / 3.0,
        (0, -1): -1.0 / 3.0, (0, 1): -1.0 / 3.0,
        (-1, -1): -1.0 / 3.0, (-1, 1): -1.0 / 3.0,
        (1, -1): -1.0 / 3.0, (1, 1): -1.0 / 3.0,
    }
    parts = [
        struct_laplacian((n, n)),
        struct_laplacian((n, n)),
        struct_from_dense_coeffs(lap9, (n, n)),  # the 9-pt part
    ]
    grid = SStructGrid(((n, n),) * 3)
    g = SStructGraphBuilder(grid)
    for j in range(n):
        # chain the parts left-to-right like ex8's diagram
        g.add_entry(0, (n - 1, j), 1, (0, j), -1.0)
        g.add_entry(1, (0, j), 0, (n - 1, j), -1.0)
        g.add_entry(1, (n - 1, j), 2, (0, j), -1.0)
        g.add_entry(2, (0, j), 1, (n - 1, j), -1.0)
    A = sstruct_matrix(parts, grid, g)
    b = jnp.ones(A.n_rows, parts[0].dtype)
    x, info = gmres(
        A.as_linear_op(), b, M=SplitSolver().setup(A).precond(), rtol=1e-6, maxiter=3000
    )
    assert bool(info.converged)
    print(
        f"ex8: Split-GMRES on 3 parts (5pt,5pt,9pt): "
        f"{int(info.iterations)} iterations"
    )
    return info


if __name__ == "__main__":
    main()
