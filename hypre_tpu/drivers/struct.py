"""struct driver — mirrors ``src/test/struct.c`` (solver ids at
struct.c:1604-1626): 0=SMG, 1=PFMG, 8=Jacobi, 10=SMG-PCG, 11=PFMG-PCG,
17=DS-PCG, 18=PCG, 30=SMG-GMRES, 31=PFMG-GMRES. Same golden output format
as the ij driver."""

from __future__ import annotations

import sys

import numpy as np


def parse_args(argv):
    a = dict(
        solver=1, nx=32, ny=32, nz=1, tol=1e-6, max_iter=200,
        cx=1.0, cy=1.0, cz=1.0, n_pre=1, n_post=1, rhs="ones",
        relax=1,
    )
    i = 0
    while i < len(argv):
        f = argv[i]
        def take(n=1):
            nonlocal i
            vals = argv[i + 1 : i + 1 + n]
            i += n
            return vals if n > 1 else vals[0]
        if f == "-solver":
            a["solver"] = int(take())
        elif f == "-n":
            a["nx"], a["ny"], a["nz"] = (int(v) for v in take(3))
        elif f == "-c":
            a["cx"], a["cy"], a["cz"] = (float(v) for v in take(3))
        elif f == "-tol":
            a["tol"] = float(take())
        elif f == "-max_iter":
            a["max_iter"] = int(take())
        elif f == "-v":
            a["n_pre"], a["n_post"] = (int(v) for v in take(2))
        elif f == "-relax":
            a["relax"] = int(take())
        elif f == "-rhsrand":
            a["rhs"] = "rand"
        elif f == "-jump":
            a["jump"] = int(take())
        else:
            raise SystemExit(f"unknown flag {f}")
        i += 1
    return a


def run(argv) -> tuple[int, float]:
    import jax.numpy as jnp

    from hypre_tpu.krylov import gmres, pcg
    from hypre_tpu.problems.struct_problems import struct_laplacian
    from hypre_tpu.struct import PFMG, SMG, SparseMSG, StructHybrid, StructJacobi

    a = parse_args(argv)
    shape = (a["nx"], a["ny"]) if a["nz"] <= 1 else (a["nx"], a["ny"], a["nz"])
    weights = (a["cx"], a["cy"], a["cz"])[: len(shape)]
    A = struct_laplacian(shape, weights=weights)
    if a["rhs"] == "rand":
        b = jnp.asarray(np.random.default_rng(0).random(shape), A.dtype)
    else:
        b = jnp.ones(shape, A.dtype)

    relax_name = {0: "jacobi", 1: "jacobi", 2: "rb-gs"}.get(a["relax"], "rb-gs")

    def pfmg():
        return PFMG(
            relax_type=relax_name, num_pre_relax=a["n_pre"],
            num_post_relax=a["n_post"],
        ).setup(A)

    def smg():
        return SMG(num_pre_relax=a["n_pre"], num_post_relax=a["n_post"]).setup(A)

    s = a["solver"]
    kw = dict(rtol=a["tol"], maxiter=a["max_iter"])
    if s == 0:
        x, info = smg().solve(b, rtol=a["tol"], maxiter=a["max_iter"])
    elif s == 1:
        x, info = pfmg().solve(b, rtol=a["tol"], maxiter=a["max_iter"])
    elif s == 2:
        # struct.c solver 2: SparseMSG (jump via -jump)
        x, info = SparseMSG(jump=a.get("jump", 0)).setup(A).solve(
            b, rtol=a["tol"], maxiter=a["max_iter"])
    elif s == 8:
        x, info = StructJacobi().setup(A).solve(b, rtol=a["tol"], maxiter=a["max_iter"])
    elif s in (20, 21, 22):
        # struct.c 20/21/22: Hybrid with SMG/PFMG/SparseMSG escalation
        # (SparseMSG escalation maps onto the PFMG branch)
        hy = StructHybrid(precond_type="smg" if s == 20 else "pfmg",
                          precond_knobs=dict(num_pre_relax=a["n_pre"],
                                             num_post_relax=a["n_post"]))
        x, info = hy.setup(A).solve(b, rtol=a["tol"])
    elif s in (10, 11, 12, 17, 18, 30, 31, 32):
        op = A.as_linear_op()
        bf = b.reshape(-1)
        if s == 10:
            M = smg().precond()
        elif s == 11:
            M = pfmg().precond()
        elif s == 12:
            M = SparseMSG(jump=a.get("jump", 0)).setup(A).precond()
        elif s == 17:
            from hypre_tpu.struct.relax import diag_inverse

            dinv = diag_inverse(A).reshape(-1)
            M = lambda r: dinv * r
        else:
            M = None
        if s in (30, 31, 32):
            if s == 32:
                M = SparseMSG(jump=a.get("jump", 0)).setup(A).precond()
            else:
                M = smg().precond() if s == 30 else pfmg().precond()
            x, info = gmres(op, bf, M=M, **kw)
        else:
            x, info = pcg(op, bf, M=M, **kw)
    else:
        raise SystemExit(f"unsupported solver id {s}")

    iters = int(info.iterations)
    rel = float(info.relative_residual)
    print(f"Iterations = {iters}")
    print(f"Final Relative Residual Norm = {rel:e}")
    return iters, rel


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
