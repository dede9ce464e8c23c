"""BiCGSTAB — stabilized bi-conjugate gradients (hypre krylov/bicgstab.c).

Right-preconditioned van der Vorst BiCGSTAB with hypre's stopping rule
(two-norm of the true residual relative to ||b||) and breakdown guards on
rho, <rhat,v> and <t,t>.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.krylov.base import LinearOp, identity_precond
from hypre_tpu.seq.vector import dot


def bicgstab(
    A: LinearOp,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M: Optional[LinearOp] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    logging: int = 0,
    recompute_residual: bool = False,
    residual_fn: Optional[LinearOp] = None,
    final_residual: bool = True,
) -> tuple[jax.Array, ConvergenceInfo]:
    """recompute_residual: on a tentative convergence pass, recompute
    r = b - A x from scratch, redo the test, and keep iterating on the
    fresh residual if it fails (the PCG recompute semantics of
    krylov/pcg.h:97-118 applied here; defaults OFF like hypre).
    final_residual (default ON): recompute the REPORTED residual once
    after the loop so it can never drift from the truth — no change to
    iteration counts. residual_fn optionally supplies an exact evaluator
    (e.g. seq/twofloat.py)."""
    M = M or identity_precond
    x = jnp.zeros_like(b) if x0 is None else x0
    res_fn = residual_fn if residual_fn is not None else (
        lambda xv: b - A(xv)
    )

    r = b - A(x)
    rhat = r
    b_prod = dot(b, b)
    eps = jnp.maximum(rtol * rtol * b_prod, atol * atol)
    v = jnp.zeros_like(b)
    p = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)

    def cond(state):
        _, r, *_, i_prod, it, ok, _, _, _ = state
        return (i_prod > eps) & (it < maxiter) & ok

    def body(state):
        (x, r, p, v, rho, alpha, omega, _, it, _, norms,
         last_recomp, stall) = state
        rho_new = dot(rhat, r)
        beta = (rho_new / rho) * (alpha / omega)
        p = r + beta * (p - omega * v)
        ph = M(p)
        v = A(ph)
        rv = dot(rhat, v)
        alpha = rho_new / rv
        s = r - alpha * v
        sh = M(s)
        t = A(sh)
        tt = dot(t, t)
        omega = dot(t, s) / jnp.where(tt > 0, tt, 1.0)
        x = x + alpha * ph + omega * sh
        r = s - omega * t
        i_prod = dot(r, r)
        if recompute_residual:
            def _recomp(_):
                r2 = res_fn(x)
                return r2, dot(r2, r2)

            tentative = i_prod <= eps
            r, i_prod = jax.lax.cond(
                tentative, _recomp, lambda _: (r, i_prod), None
            )
        ok = jnp.isfinite(i_prod) & (rho_new != 0) & (rv != 0) & (tt > 0)
        if recompute_residual:
            # stagnation exit — same guard as pcg.py: 3 consecutive failing
            # recomputes without >=10% i_prod improvement stop the solve
            # (converged=False, stagnated=True) instead of spinning to
            # maxiter at the f32 attainable floor
            failed_recomp = tentative & (i_prod > eps)
            improved = i_prod <= 0.9 * last_recomp
            stall = jnp.where(
                failed_recomp,
                jnp.where(improved, jnp.int32(0), stall + 1),
                stall,
            )
            last_recomp = jnp.where(failed_recomp, i_prod, last_recomp)
            ok = ok & (stall < 3)
        if logging > 0:
            norms = norms.at[it + 1].set(jnp.sqrt(jnp.maximum(i_prod, 0.0)))
        return (x, r, p, v, rho_new, alpha, omega, i_prod, it + 1, ok,
                norms, last_recomp, stall)

    i0 = dot(r, r)
    if logging > 0:
        norms0 = jnp.full(maxiter + 1, -1.0, b.dtype).at[0].set(
            jnp.sqrt(jnp.maximum(i0, 0.0))
        )
    else:
        norms0 = jnp.zeros((0,), b.dtype)
    state = (x, r, p, v, one, one, one, i0, jnp.int32(0), jnp.array(True),
             norms0, jnp.asarray(jnp.inf, i0.dtype), jnp.int32(0))
    (x, r, *_, i_prod, iters, ok, norms, _,
     stall) = jax.lax.while_loop(cond, body, state)

    safe_b = jnp.where(b_prod > 0, b_prod, 1.0)
    if final_residual:
        rf = res_fn(x)
        i_rep = dot(rf, rf)
    else:
        i_rep = i_prod
    rel = jnp.sqrt(jnp.maximum(i_rep, 0.0) / safe_b)
    converged = ((i_prod <= eps) & ok) | (b_prod == 0)
    return x, make_convergence_info(
        iters, rel, converged,
        res_history=norms if logging > 0 else None,
        stagnated=(stall >= 3) if recompute_residual else None,
    )
