"""ex10 analogue (src/examples/ex10.cxx): bilinear FEM Laplace assembly
through the FEI interface, solved with AMG-preconditioned CG."""

import numpy as np


def main(n=16):
    from hypre_tpu.fei import FEISystem

    ke = np.array([
        [ 2/3, -1/6, -1/3, -1/6],
        [-1/6,  2/3, -1/6, -1/3],
        [-1/3, -1/6,  2/3, -1/6],
        [-1/6, -1/3, -1/6,  2/3],
    ])
    fe = np.full(4, 0.25 / (n * n))
    fei = FEISystem().initFields()
    fei.initElemBlock("blk", n * n, 4)
    for i in range(n):
        for j in range(n):
            conn = [(i, j), (i + 1, j), (i + 1, j + 1), (i, j + 1)]
            fei.sumInElemMatrix("blk", (i, j), conn, ke)
            fei.sumInElemRHS("blk", (i, j), conn, fe)
    bnd = [(i, j) for i in range(n + 1) for j in range(n + 1)
           if i in (0, n) or j in (0, n)]
    fei.loadNodeBCs(bnd, [0.0] * len(bnd))
    fei.loadComplete()
    x, info = fei.parameters(["solver cg", "preconditioner boomeramg"]).solve(
        rtol=1e-8
    )
    assert bool(info.converged)
    print(f"ex10: FEI Q1 FEM + AMG-CG: {int(info.iterations)} iterations")
    return info


if __name__ == "__main__":
    main()
