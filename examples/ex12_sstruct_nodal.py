"""ex12 analogue (src/examples/ex12.c): the ex1 grid with nodal unknowns;
PCG preconditioned with either PFMG (struct path) or BoomerAMG (the
sstruct object converted to the unstructured matrix), selected by flag."""

import sys

import jax.numpy as jnp
import numpy as np


def main(n=24, solver="pfmg"):
    from hypre_tpu.krylov import pcg
    from hypre_tpu.problems.struct_problems import struct_laplacian
    from hypre_tpu.struct import PFMG
    from hypre_tpu.struct.matrix import struct_matvec

    A = struct_laplacian((n, n))
    b = jnp.ones((n, n), A.dtype)

    def op(v):
        return struct_matvec(A, v.reshape(n, n)).reshape(-1)

    if solver == "pfmg":
        pf = PFMG().setup(A)
        M = lambda r: pf.cycle(r.reshape(n, n)).reshape(-1)
    else:  # 'amg': object_type HYPRE_PARCSR — same grid through BoomerAMG
        from hypre_tpu.amg import BoomerAMG
        from hypre_tpu.problems.laplacian import laplacian_2d_5pt

        amg = BoomerAMG().setup(laplacian_2d_5pt(n, n))
        M = amg.precond()
    x, info = pcg(op, b.reshape(-1), M=M, rtol=1e-6)
    assert bool(info.converged)
    print(f"ex12[{solver}]: {int(info.iterations)} iterations")
    return info


if __name__ == "__main__":
    main(solver=sys.argv[1] if len(sys.argv) > 1 else "pfmg")
    main(solver="amg")
