"""ex18 analogue (src/examples/ex18.c): the 4-dimensional Laplacian
through the SEMI-structured interface — one part, one cell-centered
variable on a 4-D box — solved with diagonally-scaled CG (the reference
drives plain PCG too; its point is the NDIM grid machinery)."""

import jax.numpy as jnp

from hypre_tpu.krylov import pcg
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.sstruct import SplitSolver, SStructGrid
from hypre_tpu.sstruct.matrix import sstruct_matrix


def main(n=6, ndim=4):
    shape = (n,) * ndim
    part = struct_laplacian(shape)
    grid = SStructGrid((shape,))
    A = sstruct_matrix([part], grid)

    b = jnp.ones(A.n_rows, part.dtype)
    dinv = jnp.full(A.n_rows, 1.0 / (2.0 * ndim), part.dtype)
    x, info = pcg(A.as_linear_op(), b, M=lambda r: dinv * r, rtol=1e-6)
    print(
        f"ex18: sstruct {ndim}-D Laplacian ({n}^{ndim} cells): "
        f"{int(info.iterations)} iterations"
    )
    assert bool(info.converged)
    return info


if __name__ == "__main__":
    main()
