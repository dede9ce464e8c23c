"""ex11 analogue (src/examples/ex11.c): smallest eigenpairs of the 2-D
Laplacian with LOBPCG, preconditioned by an AMG cycle."""

import numpy as np
import jax.numpy as jnp

from hypre_tpu import laplacian_2d_5pt
from hypre_tpu.amg import BoomerAMG
from hypre_tpu.krylov import block_op, lobpcg
from hypre_tpu.seq.ell import ell_spmv


def main(n=32, m=4):
    A = laplacian_2d_5pt(n, n)
    amg = BoomerAMG().setup(A)
    X0 = jnp.asarray(np.random.default_rng(7).standard_normal((n * n, m)), A.dtype)
    lam, X, rn = lobpcg(
        block_op(lambda v: ell_spmv(A, v)),
        X0,
        T=block_op(amg.precond()),
        tol=1e-6,
        maxiter=100,
    )
    # analytic: 4 sin^2(p pi / (2(n+1))) + 4 sin^2(q pi / (2(n+1)))
    s = lambda k: 4 * np.sin(k * np.pi / (2 * (n + 1))) ** 2
    want = np.sort([s(p) + s(q) for p in range(1, 4) for q in range(1, 4)])[:m]
    got = np.sort(np.asarray(lam))
    print(f"ex11: LOBPCG eigenvalues {got} (analytic {want})")
    assert np.allclose(got, want, rtol=1e-4)
    return lam


if __name__ == "__main__":
    main()
