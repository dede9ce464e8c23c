"""Mixed-precision iterative refinement — f64 accuracy from f32 TPU solves.

TPU hardware has no fast f64, so solves run in f32 and the attainable TRUE
residual is limited to ~kappa(A)*eps_f32 even when the solver's recursive
residual reports 1e-6 (observed: 2e-4 on a 128^3 Laplacian, 1e-2 on a 4096^2
one). hypre runs f64 end-to-end; to meet its tolerances the TPU-native
answer is classical iterative refinement:

    repeat: r = b - A x   (f64, host, native CSR kernels — cheap)
            d = solve_f32(r)  (the fast TPU solve)
            x = x + d         (f64)

Each pass multiplies the true residual by the f32 solve's contraction, so a
couple of passes reach f64-grade true residuals at f32 speed.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from hypre_tpu.seq.ell import EllMatrix


def refine_solve(
    A: EllMatrix,
    solve_f32: Callable,
    b,
    rtol: float = 1e-6,
    max_refine: int = 4,
):
    """Returns (x_f64, true_rel_residual, inner_iteration_total).

    solve_f32(r_f32) -> (d, info) runs the fast device solve.
    """
    from hypre_tpu import native
    from hypre_tpu.amg.hierarchy import _ell_to_csr_arrays

    n, Ap, Aj, Ax = _ell_to_csr_arrays(A)
    b64 = np.asarray(b, np.float64)
    nb = float(np.linalg.norm(b64))
    if nb == 0:
        return np.zeros_like(b64), 0.0, 0
    x = np.zeros_like(b64)
    total_iters = 0
    rel = 1.0
    for _ in range(max_refine):
        r = b64 - native.matvec(n, Ap, Aj, Ax, x)
        rel = float(np.linalg.norm(r) / nb)
        if rel <= rtol:
            break
        d, info = solve_f32(np.asarray(r, np.float32))
        total_iters += int(info.iterations)
        x = x + np.asarray(d, np.float64)
    return x, rel, total_iters


def make_device_refiner(inner_solve, passes: int = 3,
                        residual_2f: bool = False):
    """Device-resident two-float refinement: represent x as an unevaluated
    f32 pair (x_hi + x_lo) so the accumulated solution carries extra digits,
    and compute residuals as (b - A x_hi) - A x_lo — the cancellation in the
    first term happens before the small term is subtracted. All passes fuse
    into ONE jitted program; no host round-trips, no f64 ops.

    residual_2f=False: plain f32 residuals — the attainable true residual is
    limited by the f32 SpMV's own rounding (~1e-4 relative on the bench
    Laplacians).
    residual_2f=True (DiaMatrix operators): residuals evaluated with
    error-free transforms (seq/twofloat.py), carrying ~48 significand bits —
    refinement then reaches hypre's f64-class 1e-8 tolerances entirely on
    chip (hypre computes everything in HYPRE_Real = double,
    ``utilities/HYPRE_utilities.h:71-80``; this is the TPU-native
    equivalent tier).

    inner_solve(Af, hier_args..., r) -> (d, info): the traceable f32 solve.
    A LIST of such closures runs one per pass (a tolerance schedule: the
    first pass does the heavy reduction, later passes only polish — fewer
    total Krylov iterations than equal-tolerance passes).
    Returns jitted refined(Af, *hier_args, b) -> (x_hi, x_lo, info).
    """
    import jax
    import jax.numpy as jnp

    solvers = (
        list(inner_solve)
        if isinstance(inner_solve, (list, tuple))
        else [inner_solve] * passes
    )

    @jax.jit
    def refined(Af, *args_and_b):
        *hier_args, b = args_and_b
        x_hi = jnp.zeros_like(b)
        x_lo = jnp.zeros_like(b)
        info = None
        for solve_p in solvers:
            if residual_2f:
                from hypre_tpu.seq.twofloat import dia_residual_2f

                r_hi, r_lo = dia_residual_2f(Af, b, x_hi, x_lo)
                r = r_hi  # r_lo is below the inner solve's f32 resolution
            else:
                r = (b - Af.mv(x_hi)) - Af.mv(x_lo)
            d, info = solve_p(Af, *hier_args, r)
            t = x_lo + d  # Fast2Sum accumulation
            hi = x_hi + t
            x_lo = t - (hi - x_hi)
            x_hi = hi
        return x_hi, x_lo, info

    return refined
