"""ex3/ex4 analogue (src/examples/ex3.c, ex4.c): anisotropic structured
problem, PFMG-preconditioned PCG — semicoarsening picks the strong axis."""

import jax.numpy as jnp

from hypre_tpu.krylov import pcg
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.struct import PFMG


def main(n=64, eps=0.05):
    A = struct_laplacian((n, n), weights=(1.0, eps))
    pf = PFMG(relax_type="jacobi").setup(A)
    b = jnp.ones(n * n, A.dtype)
    x, info = pcg(A.as_linear_op(), b, M=pf.precond(), rtol=1e-7)
    print(f"ex3: PFMG-PCG (eps={eps}) {int(info.iterations)} iterations")
    assert bool(info.converged) and int(info.iterations) <= 15
    return info


if __name__ == "__main__":
    main()
