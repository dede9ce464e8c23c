"""ex1/ex2 analogue (reference src/examples/ex1.c, ex2.c): 2-D structured
Laplacian solved with SMG. hypre splits the grid over 2 MPI ranks; here the
grid is one dense array and XLA's partitioner owns any distribution."""

import jax.numpy as jnp

from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.struct import SMG
from hypre_tpu.struct.matrix import struct_matvec


def main(n=64):
    A = struct_laplacian((n, n))
    b = jnp.ones((n, n), A.dtype)
    x, info = SMG().setup(A).solve(b, rtol=1e-6)
    r = b - struct_matvec(A, x)
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    print(f"ex1: SMG {int(info.iterations)} iterations, true rel res {rel:.2e}")
    assert bool(info.converged) and rel < 1e-5
    return info


if __name__ == "__main__":
    main()
