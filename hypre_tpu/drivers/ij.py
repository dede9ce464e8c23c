"""ij driver — mirrors ``src/test/ij.c`` (flags at ij.c:521-575, solver ids
at ij.c:2022-2046, coarsening flags :2047-2059).

Output format matches the reference goldens (TEST_ij/solvers.saved):

    Iterations = N
    Final Relative Residual Norm = X
"""

from __future__ import annotations

import sys

import numpy as np


SOLVER_HELP = """solver ids (ij.c:2022-2046 subset):
  0 = AMG            1 = AMG-PCG        2 = DS-PCG        3 = AMG-GMRES
  4 = DS-GMRES       5 = AMG-CGNR       6 = DS-CGNR       8 = ParaSails-PCG
  9 = AMG-BiCGSTAB  10 = DS-BiCGSTAB   12 = Schwarz-PCG  16 = AMG-COGMRES
 13 = GSMG          14 = GSMG-PCG    15 = GSMG-GMRES
 18 = ParaSails-GMRES  20 = Hybrid     31 = FSAI-PCG     50 = AMG-LGMRES
 60 = AMG-FlexGMRES   70 = MGR-GMRES   80 = ILU-GMRES
  7 = PILUT-GMRES    43 = Euclid-PCG  46 = Euclid-GMRES  81 = ILUT-GMRES
 90 = AMG-DD        91 = AMG-DD-GMRES"""


def parse_args(argv):
    a = dict(
        solver=1, nx=40, ny=40, nz=1, problem="laplacian", tol=1e-8,
        max_iter=1000, coarsen="pmis", interp="ext+i", relax="chebyshev",
        theta=0.25, agg_nl=0, pmx=4, ns=1, k_dim=30, rhs="ones",
        fromfile=None, eps=1.0, two_norm=True, poutdat=0,
        additive=-1, add_variant="additive", rlx_wt=1.0, cheby_eig_est=0,
        relax_order=0, max_row_sum=0.9, smooth_type="",
        smooth_num_levels=0, smooth_weight=1.0, recompute_res=1,
        recompute_res_p=0,
    )
    it = iter(range(len(argv)))
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
        elif f == "-laplacian":
            a["problem"] = "laplacian"
        elif f == "-9pt":
            a["problem"] = "9pt"
        elif f == "-27pt":
            a["problem"] = "27pt"
        elif f == "-difconv":
            a["problem"] = "difconv"
        elif f == "-vardifconv":
            a["problem"] = "vardifconv"
        elif f == "-rotate":
            a["problem"] = "rotate"
        elif f == "-fromfile":
            a["problem"], a["fromfile"] = "fromfile", take()
        elif f in ("-pmis", "-pmis1"):
            a["coarsen"] = "pmis"
        elif f == "-cljp":
            a["coarsen"] = "cljp"
        elif f == "-ruge":
            a["coarsen"] = "ruge"
        elif f == "-falgout":
            a["coarsen"] = "falgout"
        elif f == "-hmis":
            a["coarsen"] = "hmis"
        elif f == "-interptype":
            a["interp"] = {0: "classical", 3: "direct", 6: "ext+i", 14: "ext+i"}[
                int(take())
            ]
        elif f == "-rlx":
            a["relax"] = {
                0: "jacobi", 7: "jacobi", 18: "l1-jacobi", 16: "chebyshev",
                11: "two-stage-gs", 12: "sym-two-stage-gs", 20: "kaczmarz",
            }[int(take())]
        elif f == "-CF":
            a["relax_order"] = int(take())
        elif f == "-tol":
            a["tol"] = float(take())
        elif f == "-recompute":
            # ij.c:1634 -recompute <0|1> -> HYPRE_PCGSetRecomputeResidual;
            # defaults ON here (f32-native chip, see krylov/pcg.py)
            a["recompute_res"] = int(take())
        elif f == "-recompute_p":
            a["recompute_res_p"] = int(take())
        elif f == "-max_iter":
            a["max_iter"] = int(take())
        elif f == "-th":
            a["theta"] = float(take())
        elif f == "-mxrs":
            a["max_row_sum"] = float(take())
        elif f == "-smtype":
            # hypre ij.c smooth_type numbering: 4=FSAI-class, 5=ILU, 6=Schwarz
            a["smooth_type"] = {4: "fsai", 5: "ilu", 6: "schwarz"}[int(take())]
        elif f == "-smlv":
            a["smooth_num_levels"] = int(take())
        elif f == "-sw":
            a["smooth_weight"] = float(take())
        elif f == "-agg_nl":
            a["agg_nl"] = int(take())
        elif f == "-Pmx":
            a["pmx"] = int(take())
        elif f == "-ns":
            a["ns"] = int(take())
        elif f == "-k":
            a["k_dim"] = int(take())
        elif f == "-rhsrand":
            a["rhs"] = "rand"
        elif f == "-poutdat":
            # hypre ij.c's ioutdat: 1 = setup stats, >=2 adds the
            # per-iteration residual table (SetPrintLevel/SetLogging)
            a["poutdat"] = int(take())
        elif f == "-eps":
            a["eps"] = float(take())
        elif f == "-additive":
            # HYPRE_BoomerAMGSetAdditive (ij.c -additive <level>)
            a["additive"], a["add_variant"] = int(take()), "additive"
        elif f == "-mult_add":
            a["additive"], a["add_variant"] = int(take()), "mult"
        elif f == "-simple":
            a["additive"], a["add_variant"] = int(take()), "simple"
        elif f == "-w":
            # ij.c -w: Jacobi relax weight; negative = CG-determined
            # (hypre_BoomerAMGCGRelaxWt)
            a["rlx_wt"] = float(take())
        elif f == "-cheby_eig_est":
            a["cheby_eig_est"] = int(take())
        elif f == "-help":
            print(SOLVER_HELP)
            raise SystemExit(0)
        else:
            raise SystemExit(f"unknown flag {f} (see -help)")
        i += 1
    return a


def build_problem(a):
    from hypre_tpu.io import read_any_matrix
    from hypre_tpu.problems.laplacian import (
        difconv_3d_7pt, laplacian_2d_5pt, laplacian_2d_9pt, laplacian_3d_7pt,
        laplacian_3d_27pt, rotated_anisotropy_2d, vardifconv_3d,
    )
    from hypre_tpu.seq.ell import csr_to_ell

    nx, ny, nz = a["nx"], a["ny"], a["nz"]
    if a["problem"] == "fromfile":
        return csr_to_ell(read_any_matrix(a["fromfile"]))
    if a["problem"] == "9pt":
        return laplacian_2d_9pt(nx, ny)
    if a["problem"] == "27pt":
        return laplacian_3d_27pt(nx, ny, max(nz, 2))
    if a["problem"] == "difconv":
        return difconv_3d_7pt(nx, ny, max(nz, 2), eps=a["eps"])
    if a["problem"] == "vardifconv":
        return vardifconv_3d(nx, ny, max(nz, 2), eps=a["eps"])
    if a["problem"] == "rotate":
        return rotated_anisotropy_2d(nx, ny, eps=a["eps"])
    if nz <= 1:
        return laplacian_2d_5pt(nx, ny)
    return laplacian_3d_7pt(nx, ny, nz)


def run(argv) -> tuple[int, float]:
    import jax.numpy as jnp

    from hypre_tpu.amg import BoomerAMG
    from hypre_tpu.amg.hybrid import HybridSolver
    from hypre_tpu.amg.mgr import MGR
    from hypre_tpu.krylov import (
        bicgstab, cgnr, cogmres, flexgmres, gmres, lgmres, pcg,
    )
    from hypre_tpu.precond import FSAI, ILU, ParaSails, Schwarz
    from hypre_tpu.seq.ell import ell_spmv, ell_spmv_t

    a = parse_args(argv)
    A = build_problem(a)
    n = A.n_rows
    if a["rhs"] == "rand":
        b = jnp.asarray(np.random.default_rng(0).random(n), A.dtype)
    else:
        b = jnp.ones(n, A.dtype)
    op = lambda v: ell_spmv(A, v)
    dinv = 1.0 / A.diagonal()

    _amg_cache = []

    def amg():
        solver = BoomerAMG(
            coarsen_type=a["coarsen"], interp=a["interp"], relax=a["relax"],
            strength_threshold=a["theta"], agg_num_levels=a["agg_nl"],
            max_row_sum=a["max_row_sum"], smooth_type=a["smooth_type"],
            smooth_num_levels=a["smooth_num_levels"],
            smooth_weight=a["smooth_weight"],
            p_max_elmts=a["pmx"], num_sweeps=a["ns"],
            additive=a["additive"], additive_variant=a["add_variant"],
            relax_weight=a["rlx_wt"], cheby_eig_est=a["cheby_eig_est"],
            relax_order=a["relax_order"],
        ).setup(A)
        _amg_cache.append(solver)  # kept for -poutdat setup stats
        return solver

    s = a["solver"]
    kw = dict(rtol=a["tol"], maxiter=a["max_iter"])
    pcg_kw = dict(
        recompute_residual=bool(a["recompute_res"]),
        recompute_residual_p=a["recompute_res_p"],
    )
    if a["poutdat"] >= 2:
        kw["logging"] = 1
    if s == 0:
        x, info = amg().solve(b, rtol=a["tol"], maxiter=a["max_iter"])
    elif s == 1:
        x, info = pcg(op, b, M=amg().precond(), **kw, **pcg_kw)
    elif s == 2:
        x, info = pcg(op, b, M=lambda r: dinv * r, **kw, **pcg_kw)
    elif s == 3:
        x, info = gmres(op, b, M=amg().precond(), k_dim=a["k_dim"], **kw)
    elif s == 4:
        x, info = gmres(op, b, M=lambda r: dinv * r, k_dim=a["k_dim"], **kw)
    elif s == 5:
        x, info = cgnr(op, lambda v: ell_spmv_t(A, v), b, M=amg().precond(), **kw)
    elif s == 6:
        x, info = cgnr(op, lambda v: ell_spmv_t(A, v), b, **kw)
    elif s == 8:
        x, info = pcg(op, b, M=ParaSails().setup(A).precond(), **kw, **pcg_kw)
    elif s == 9:
        x, info = bicgstab(op, b, M=amg().precond(), **kw)
    elif s == 10:
        x, info = bicgstab(op, b, M=lambda r: dinv * r, **kw)
    elif s == 12:
        x, info = pcg(op, b, M=Schwarz().setup(A).precond(), **kw, **pcg_kw)
    elif s in (13, 14, 15):
        from hypre_tpu.amg.gsmg import GSMG

        gs = GSMG(strength_threshold=a["theta"], p_max_elmts=a["pmx"])
        gs.setup(A)
        if s == 13:
            x, info = gs.solve(b, rtol=a["tol"], maxiter=a["max_iter"])
        elif s == 14:
            x, info = pcg(op, b, M=gs.precond(), **kw, **pcg_kw)
        else:
            x, info = gmres(op, b, M=gs.precond(), k_dim=a["k_dim"], **kw)
    elif s == 16:
        x, info = cogmres(op, b, M=amg().precond(), k_dim=a["k_dim"], **kw)
    elif s == 18:
        x, info = gmres(op, b, M=ParaSails().setup(A).precond(), k_dim=a["k_dim"], **kw)
    elif s == 20:
        x, info = HybridSolver().setup(A).solve(b, rtol=a["tol"])
    elif s == 31:
        x, info = pcg(op, b, M=FSAI().setup(A).precond(), **kw, **pcg_kw)
    elif s == 50:
        x, info = lgmres(op, b, M=amg().precond(), k_dim=a["k_dim"], **kw)
    elif s == 60:
        x, info = flexgmres(op, b, M=amg().precond(), k_dim=a["k_dim"], **kw)
    elif s == 70:
        cpts = np.arange(n)[(np.arange(n) % 2) == 0]
        x, info = gmres(op, b, M=MGR().setup(A, [cpts]).precond(), **kw)
    elif s == 80:
        x, info = gmres(op, b, M=ILU().setup(A).precond(), **kw)
    elif s == 7:
        from hypre_tpu.precond import PILUT

        x, info = gmres(op, b, M=PILUT().setup(A).precond(),
                        k_dim=a["k_dim"], **kw)
    elif s in (43, 46):
        from hypre_tpu.precond import Euclid

        M = Euclid(level=1).setup(A).precond()
        if s == 43:
            x, info = pcg(op, b, M=M, **kw, **pcg_kw)
        else:
            x, info = gmres(op, b, M=M, k_dim=a["k_dim"], **kw)
    elif s == 81:
        from hypre_tpu.precond import ILUT

        x, info = gmres(op, b, M=ILUT().setup(A).precond(),
                        k_dim=a["k_dim"], **kw)
    elif s in (90, 91):
        from hypre_tpu.parallel.amgdd import AMGDD

        dd = AMGDD(padding=2).setup(A, num_devices=4)
        if s == 90:
            x, info = dd.solve(b, rtol=a["tol"], maxiter=a["max_iter"])
        else:
            x, info = gmres(op, b, M=dd.precond(), k_dim=a["k_dim"], **kw)
    else:
        raise SystemExit(f"unsupported solver id {s}\n{SOLVER_HELP}")

    from hypre_tpu.core.error import record_convergence

    record_convergence(info)  # HYPRE_ERROR_CONV semantics (pcg.c)
    iters = int(info.iterations)
    rel = float(info.relative_residual)
    if a["poutdat"] >= 1 and "_amg_cache" in locals() and _amg_cache:
        from hypre_tpu.stats import amg_setup_report

        print(amg_setup_report(
            _amg_cache[0].hierarchy, strength_threshold=a["theta"],
            coarsen=a["coarsen"], interp=a["interp"],
        ))
    if a["poutdat"] >= 2 and info.res_history is not None:
        import jax.numpy as _jnp

        from hypre_tpu.stats import format_iteration_log

        print(format_iteration_log(
            info, float(_jnp.linalg.norm(b)), two_norm=a["two_norm"]
        ))
    print(f"Iterations = {iters}")
    print(f"Final Relative Residual Norm = {rel:e}")
    return iters, rel


def main():
    run(sys.argv[1:])


if __name__ == "__main__":
    main()
