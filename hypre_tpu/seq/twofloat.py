"""Error-free-transform (two-float / double-f32) kernels.

TPU has no fast f64; hypre's 1e-8-class golden residuals
(``TEST_ij/solvers.saved:1-30``, all computed in ``HYPRE_Real`` = double,
``utilities/HYPRE_utilities.h:71-80``) are unreachable by a plain f32
residual: fl(b - A x) carries O(eps_f32 * ||A|| ||x||) rounding, a ~1e-4
relative floor on the bench Laplacians. The classical fix is compensated
arithmetic — every f32 product and sum also produces its exact rounding
error (Dekker/Knuth error-free transforms), and the error channel is
carried as a second f32. The pair (hi, lo) represents hi + lo with ~48
significand bits, enough to evaluate residuals to ~1e-10 relative and let
device-resident iterative refinement reach hypre's f64 tolerances entirely
on chip. All ops are elementwise VPU work that XLA fuses into the stencil
pass — the SpMV stays memory-bound, ~2-3x the plain-f32 flop count.

No FMA is assumed: two_prod uses Dekker splitting (12-bit halves for f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hypre_tpu.seq.dia import DiaMatrix, _shift1d_dyn

_SPLIT = 4097.0  # 2^12 + 1: Dekker split constant for f32 (24-bit mantissa)


def two_sum(a, b):
    """s + e == a + b exactly (Knuth, branch-free)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """s + e == a + b exactly, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    """a == hi + lo with hi carrying the top 12 significand bits."""
    t = a * _SPLIT
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """p + e == a * b exactly (Dekker product, no FMA)."""
    p = a * b
    ah, al = split(a)
    bh, bl = split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dia_mv_2f(A: DiaMatrix, x: jax.Array):
    """(y_hi, y_lo) ~= A @ x with compensated products and sums: y_hi + y_lo
    matches the exact (real-arithmetic) product of the f32 inputs to ~2^-48
    relative. Pure shifted slices + elementwise EFTs — one fused HBM pass."""
    s = jnp.zeros(A.n_rows, A.dtype)
    c = jnp.zeros(A.n_rows, A.dtype)
    for d in range(A.D):
        p, pe = two_prod(A.dvals[d], _shift1d_dyn(x, A.offsets[d], A.margin))
        s, e = two_sum(s, p)
        c = c + (e + pe)
    return fast_two_sum(s, c)


def dia_residual_2f(A: DiaMatrix, b: jax.Array, x_hi: jax.Array,
                    x_lo: jax.Array):
    """(r_hi, r_lo) ~= b - A x_hi - A x_lo in double-f32.

    The A x_hi terms and the b subtraction are fully compensated (the
    cancellation b - A x is where a plain f32 residual dies); A x_lo is
    already ~eps * ||x|| small, so its own rounding (~eps^2) is below the
    target and a plain f32 product suffices — but it is two_sum-accumulated
    so ITS cancellation against r is exact."""
    s = b
    c = jnp.zeros_like(b)
    for d in range(A.D):
        p, pe = two_prod(A.dvals[d], _shift1d_dyn(x_hi, A.offsets[d],
                                                  A.margin))
        s, e = two_sum(s, -p)
        c = c + (e - pe)
    lo_term = A.mv(x_lo) if x_lo is not None else None
    if lo_term is not None:
        s, e = two_sum(s, -lo_term)
        c = c + e
    return fast_two_sum(s, c)
