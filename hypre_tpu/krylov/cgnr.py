"""CGNR — conjugate gradients on the normal equations (hypre krylov/cgnr.c).

Solves min ||b - Ax||_2 via CG on AᵀA x = Aᵀ b, for square nonsymmetric or
rectangular A. Needs the transpose operator; hypre's vtable carries a
``MatvecT`` member for the same reason (``krylov/cgnr.c``). The optional
preconditioner M acts on the normal-equation residual (hypre's ``precondT``
pattern collapsed to one callable).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.krylov.base import LinearOp, identity_precond
from hypre_tpu.seq.vector import dot


def cgnr(
    A: LinearOp,
    At: LinearOp,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M: Optional[LinearOp] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
) -> tuple[jax.Array, ConvergenceInfo]:
    M = M or identity_precond
    x = jnp.zeros_like(b) if x0 is None else x0

    r = b - A(x)
    q = At(r)
    z = M(q)
    gamma = dot(q, z)
    p = z
    b_prod = dot(b, b)
    eps = jnp.maximum(rtol * rtol * b_prod, atol * atol)

    def cond(state):
        _, _, _, _, i_prod, it, ok = state
        return (i_prod > eps) & (it < maxiter) & ok

    def body(state):
        x, r, p, gamma, _, it, _ = state
        w = A(p)
        wdotw = dot(w, w)
        alpha = gamma / jnp.where(wdotw > 0, wdotw, 1.0)
        x = x + alpha * p
        r = r - alpha * w
        q = At(r)
        z = M(q)
        gamma_new = dot(q, z)
        i_prod = dot(r, r)
        ok = jnp.isfinite(i_prod) & (wdotw > 0)
        beta = gamma_new / jnp.where(gamma != 0, gamma, 1.0)
        p = z + beta * p
        return (x, r, p, gamma_new, i_prod, it + 1, ok)

    state = (x, r, p, gamma, dot(r, r), jnp.int32(0), jnp.array(True))
    x, r, _, _, i_prod, iters, ok = jax.lax.while_loop(cond, body, state)

    safe_b = jnp.where(b_prod > 0, b_prod, 1.0)
    rel = jnp.sqrt(jnp.maximum(i_prod, 0.0) / safe_b)
    converged = ((i_prod <= eps) & ok) | (b_prod == 0)
    return x, make_convergence_info(iters, rel, converged)
