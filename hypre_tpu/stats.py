"""Solver statistics and per-iteration logging output — hypre print parity.

Two render paths the reference drivers rely on:

- Krylov per-iteration residual tables (``krylov/pcg.c:607-655`` print_level
  block): header + ``% 5d    %e    %f    %e`` rows (iteration, ||r||,
  convergence rate, ||r||/||b||), fed from the ``res_history`` array the
  solvers record under ``logging > 0``;
- the BoomerAMG setup report (``parcsr_ls/par_stats.c``): per-level operator
  matrix information plus grid/operator complexities.
"""

from __future__ import annotations

import numpy as np


def format_iteration_log(info, b_norm: float, two_norm: bool = True) -> str:
    """Render info.res_history in hypre's PCG/GMRES print_level>1 format."""
    norms = np.asarray(info.res_history)
    lines = []
    if two_norm:
        lines.append("Iters       ||r||_2     conv.rate  ||r||_2/||b||_2")
        lines.append("-----    ------------   ---------  ------------ ")
    else:
        lines.append("Iters       ||r||_C     conv.rate  ||r||_C/||b||_C")
        lines.append("-----    ------------    ---------  ------------ ")
    bn = float(b_norm)
    for i in range(1, len(norms)):
        if norms[i] < 0:
            break
        prev = norms[i - 1] if norms[i - 1] > 0 else 1.0
        rel = norms[i] / bn if bn > 0 else 0.0
        lines.append(
            "% 5d    %e    %f    %e" % (i, norms[i], norms[i] / prev, rel)
        )
    return "\n".join(lines)


def _level_matrix_rows(levels_A):
    rows = []
    for i, A in enumerate(levels_A):
        cols = np.asarray(A.cols)
        vals = np.asarray(A.vals)
        valid = cols >= 0
        per_row = valid.sum(axis=1)
        nnz = int(per_row.sum())
        n = A.n_rows
        sparse = nnz / (n * max(A.n_cols, 1))
        row_sums = np.where(valid, vals, 0).sum(axis=1)
        rows.append(
            dict(
                lev=i, rows=n, entries=nnz, sparse=sparse,
                minr=int(per_row.min(initial=0)),
                maxr=int(per_row.max(initial=0)),
                avgr=nnz / max(n, 1),
                min_rs=float(row_sums.min(initial=0)),
                max_rs=float(row_sums.max(initial=0)),
            )
        )
    return rows


def amg_setup_report(
    hier,
    strength_threshold: float = 0.25,
    trunc_factor: float = 0.0,
    coarsen: str = "pmis",
    interp: str = "ext+i",
    max_levels: int = 25,
) -> str:
    """The par_stats.c setup report for an AMGHierarchy.

    Layout mirrors hypre_BoomerAMGSetupStats: parameters block, per-level
    operator matrix information, interpolation information, and the
    grid/operator complexity lines (printed with hypre's exact labels so
    outputs diff cleanly against reference runs).
    """
    coarsen_names = {
        "cljp": "Cleary-Luby-Jones-Plassman", "ruge": "Ruge",
        "falgout": "Falgout-CLJP", "pmis": "PMIS", "hmis": "HMIS",
        "cgc": "CGC", "cr": "CR",
    }
    interp_names = {
        "classical": "modified classical interpolation",
        "direct": "direct interpolation",
        "multipass": "multipass interpolation",
        "ext+i": "extended+i interpolation",
    }
    levels_A = [lev.A for lev in hier.levels]
    # the coarsest operator lives only as its dense inverse; report its size
    nc = hier.coarse_inv.shape[0]
    out = []
    out.append("\nBoomerAMG SETUP PARAMETERS:\n")
    out.append(f" Max levels = {max_levels}")
    out.append(f" Num levels = {len(levels_A) + 1}\n")
    out.append(f" Strength Threshold = {strength_threshold:f}")
    out.append(f" Interpolation Truncation Factor = {trunc_factor:f}\n")
    out.append(
        f" Coarsening Type = {coarsen_names.get(coarsen, coarsen)} "
    )
    out.append(f" Interpolation = {interp_names.get(interp, interp)}")
    out.append("\nOperator Matrix Information:\n")
    out.append(
        "            nonzero            entries/row          row sums"
    )
    out.append(
        "lev    rows  entries  sparse  min  max     avg        min         max"
    )
    out.append("=" * 75)
    rows = _level_matrix_rows(levels_A)
    tot_rows = sum(r["rows"] for r in rows) + nc
    tot_nnz = sum(r["entries"] for r in rows)
    for r in rows:
        out.append(
            "%3d %7d %8d  %0.3f %4d %4d  %6.1f  %10.3e  %10.3e"
            % (
                r["lev"], r["rows"], r["entries"], r["sparse"], r["minr"],
                r["maxr"], r["avgr"], r["min_rs"], r["max_rs"],
            )
        )
    out.append("%3d %7d %8s  %s" % (len(rows), nc, "dense", "(direct solve)"))
    out.append("\n\nInterpolation Matrix Information:")
    out.append(
        "lev    rows x cols    entries/row    min        max     "
    )
    out.append("=" * 60)
    for i, lev in enumerate(hier.levels):
        P = lev.P
        pcols = np.asarray(P.cols)
        pvals = np.asarray(P.vals)
        valid = pcols >= 0
        per_row = valid.sum(axis=1)
        wmin = float(np.where(valid, pvals, np.inf).min(initial=np.inf))
        wmax = float(np.where(valid, pvals, -np.inf).max(initial=-np.inf))
        out.append(
            "%3d %7d x %-7d  %2d  %2d   %10.3e %10.3e"
            % (
                i, P.n_rows, P.n_cols, int(per_row.min(initial=0)),
                int(per_row.max(initial=0)), wmin, wmax,
            )
        )
    if rows:
        fine = rows[0]
        grid_c = tot_rows / max(fine["rows"], 1)
        # operator complexity counts the dense coarse block like hypre
        # counts its coarsest CSR
        op_c = (tot_nnz + nc * nc) / max(fine["entries"], 1)
    else:
        grid_c = op_c = 1.0
    out.append("\n\n     Complexity:    grid = %f" % grid_c)
    out.append("                operator = %f" % op_c)
    out.append("\n")
    return "\n".join(out)
