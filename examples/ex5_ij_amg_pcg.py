"""ex5 analogue (src/examples/ex5.c) — THE canonical hypre path:
assemble a 2-D Laplacian through the IJ interface, solve with AMG-PCG."""

import numpy as np
import jax.numpy as jnp

from hypre_tpu.amg import BoomerAMG
from hypre_tpu.ij import IJMatrix, IJVector
from hypre_tpu.krylov import pcg
from hypre_tpu.seq.ell import ell_spmv


def main(n=64):
    N = n * n
    m = IJMatrix(N, N)
    for i in range(N):  # the ex5.c row loop
        r, c = divmod(i, n)
        cols, vals = [i], [4.0]
        for dr, dc in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            rr, cc = r + dr, c + dc
            if 0 <= rr < n and 0 <= cc < n:
                cols.append(rr * n + cc)
                vals.append(-1.0)
        m.set_values([i] * len(cols), cols, vals)
    A = m.assemble().get_object()
    b = IJVector(N).set_values(np.arange(N), np.ones(N)).assemble().get_object()

    amg = BoomerAMG().setup(A)
    x, info = pcg(lambda v: ell_spmv(A, v), b, M=amg.precond(), rtol=1e-7)
    r = b - ell_spmv(A, x)
    rel = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    print(f"ex5: AMG-PCG {int(info.iterations)} iterations, true rel res {rel:.2e}")
    assert bool(info.converged) and int(info.iterations) <= 10
    return info


if __name__ == "__main__":
    main()
