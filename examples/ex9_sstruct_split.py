"""ex8/ex9 analogue (src/examples/ex8.c, ex9.c): a multi-part
semi-structured problem — two grids glued through graph entries, solved
with the Split solver and as a preconditioned Krylov system."""

import jax.numpy as jnp
import numpy as np

from hypre_tpu.krylov import pcg
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.sstruct import SplitSolver, SStructGrid
from hypre_tpu.sstruct.matrix import SStructGraphBuilder, sstruct_matrix


def main(n=16):
    grid = SStructGrid(((n, n), (n, n)))
    parts = [struct_laplacian((n, n)) for _ in range(2)]
    g = SStructGraphBuilder(grid)
    for j in range(n):
        g.add_entry(0, (n - 1, j), 1, (0, j), -1.0)
        g.add_entry(1, (0, j), 0, (n - 1, j), -1.0)
    A = sstruct_matrix(parts, grid, g)

    b = jnp.ones(A.n_rows, A.parts[0].dtype)
    x, info = pcg(A.as_linear_op(), b, M=SplitSolver().setup(A).precond(), rtol=1e-7)
    print(f"ex9: Split-PCG on 2 glued parts: {int(info.iterations)} iterations")
    assert bool(info.converged)
    return info


if __name__ == "__main__":
    main()
