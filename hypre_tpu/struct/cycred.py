"""Parallel cyclic reduction — batched tridiagonal direct solver.

hypre's CyclicReduction solver (``struct_ls/cyclic_reduction.c``) is a 1-D
multigrid-like direct method; SMG's line relaxation needs exact tridiagonal
solves along grid lines. On TPU the right formulation is *parallel* cyclic
reduction (PCR): ceil(log2 n) fully-vectorized elimination rounds over the
whole batch of lines at once — O(n log n) flops but every round is one fused
VPU pass, no sequential recursion, no strided gather.

Solves along the LAST axis; arbitrary leading batch dims.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _shift_last(x: jax.Array, o: int, fill) -> jax.Array:
    """z[..., i] = x[..., i+o], filled with `fill` out of range."""
    if o == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(max(-o, 0), max(o, 0))]
    xp = jnp.pad(x, pad, constant_values=fill)
    start = max(o, 0)
    return jax.lax.slice_in_dim(xp, start, start + x.shape[-1], axis=-1)


def pcr_solve(a: jax.Array, b: jax.Array, c: jax.Array, d: jax.Array) -> jax.Array:
    """Solve a[i] x[i-1] + b[i] x[i] + c[i] x[i+1] = d[i] along the last axis.

    a[..., 0] and c[..., -1] are ignored (forced to 0).
    """
    n = a.shape[-1]
    if n == 1:
        return d / b
    zero_first = jnp.ones(n, a.dtype).at[0].set(0)
    zero_last = jnp.ones(n, a.dtype).at[-1].set(0)
    a = a * zero_first
    c = c * zero_last
    steps = max(1, math.ceil(math.log2(n)))
    s = 1
    for _ in range(steps):
        b_lo = _shift_last(b, -s, 1.0)  # b[i-s]
        b_hi = _shift_last(b, +s, 1.0)  # b[i+s]
        alpha = -a / b_lo
        beta = -c / b_hi
        d = d + alpha * _shift_last(d, -s, 0.0) + beta * _shift_last(d, +s, 0.0)
        b = b + alpha * _shift_last(c, -s, 0.0) + beta * _shift_last(a, +s, 0.0)
        a = alpha * _shift_last(a, -s, 0.0)
        c = beta * _shift_last(c, +s, 0.0)
        s *= 2
    return d / b


def cyclic_reduction_solve(A, b: jax.Array) -> jax.Array:
    """Direct solve of a 1-D StructMatrix system (HYPRE_CycRedSolve analogue).

    A must be 1-D with offsets within {-1, 0, +1}.
    """
    ndim = len(A.shape)
    assert ndim == 1, "cyclic reduction is the 1-D direct solver"
    n = A.shape[0]
    lo = jnp.zeros(n, A.dtype)
    di = jnp.zeros(n, A.dtype)
    hi = jnp.zeros(n, A.dtype)
    for s, off in enumerate(A.stencil.offsets):
        coeff = jnp.broadcast_to(A.coeffs[s], A.shape)
        if off[0] == -1:
            lo = lo + coeff
        elif off[0] == 0:
            di = di + coeff
        elif off[0] == 1:
            hi = hi + coeff
        else:
            raise ValueError("cyclic reduction needs a tridiagonal stencil")
    return pcr_solve(lo, di, hi, b)
