"""ex4 analogue (src/examples/ex4.c): variable-coefficient struct problem
with general boundary handling, PFMG-preconditioned PCG."""

import jax.numpy as jnp
import numpy as np

from hypre_tpu.krylov import pcg
from hypre_tpu.struct import PFMG
from hypre_tpu.struct.matrix import struct_from_dense_coeffs, struct_matvec


def main(n=32, eps=0.1):
    # -div(K grad u) with K varying smoothly (ex4's convection variant is
    # exercised by the difconv ij examples; here the struct path)
    xs = np.linspace(0, 1, n)
    K = 1.0 + 10.0 * np.outer(xs, xs)
    Kx = 0.5 * (K + np.roll(K, -1, 0))
    Ky = 0.5 * (K + np.roll(K, -1, 1))
    coeffs = {
        (0, 0): Kx + np.roll(Kx, 1, 0) + Ky + np.roll(Ky, 1, 1) + eps,
        (-1, 0): -np.roll(Kx, 1, 0),
        (1, 0): -Kx,
        (0, -1): -np.roll(Ky, 1, 1),
        (0, 1): -Ky,
    }
    # zero the fluxes across the physical boundary (Dirichlet truncation)
    coeffs[(-1, 0)][0, :] = 0
    coeffs[(1, 0)][-1, :] = 0
    coeffs[(0, -1)][:, 0] = 0
    coeffs[(0, 1)][:, -1] = 0
    A = struct_from_dense_coeffs(coeffs, (n, n))
    b = jnp.ones((n, n), A.dtype)
    pf = PFMG().setup(A)

    def op(v):
        return struct_matvec(A, v.reshape(n, n)).reshape(-1)

    def M(r):
        return pf.cycle(r.reshape(n, n)).reshape(-1)

    x, info = pcg(op, b.reshape(-1), M=M, rtol=1e-6)
    assert bool(info.converged)
    print(f"ex4: PFMG-PCG, variable coefficients: {int(info.iterations)} iterations")
    return info


if __name__ == "__main__":
    main()
