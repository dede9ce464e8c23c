"""ex17/ex18 analogue (src/examples/ex17.c, ex18.c): N-dimensional
Laplacian (here 4-D) solved with plain diagonally-scaled CG through the
struct interface's N-dim stencil machinery."""

import jax.numpy as jnp
import numpy as np

from hypre_tpu.krylov import pcg
from hypre_tpu.problems.laplacian import stencil_to_ell
from hypre_tpu.seq.ell import ell_spmv


def main(n=8, ndim=4):
    offsets = [(0,) * ndim]
    coeffs = [2.0 * ndim]
    for d in range(ndim):
        for s in (-1, 1):
            off = [0] * ndim
            off[d] = s
            offsets.append(tuple(off))
            coeffs.append(-1.0)
    A = stencil_to_ell((n,) * ndim, offsets, coeffs)
    b = jnp.ones(A.n_rows, A.dtype)
    dinv = 1.0 / A.diagonal()
    x, info = pcg(lambda v: ell_spmv(A, v), b, M=lambda r: dinv * r,
                  rtol=1e-6, maxiter=500)
    assert bool(info.converged)
    print(f"ex17: {ndim}-D Laplacian ({A.n_rows} rows) DS-CG: "
          f"{int(info.iterations)} iterations")
    return info


if __name__ == "__main__":
    main()
