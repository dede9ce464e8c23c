"""Restarted GMRES with CGS2 orthogonalization.

Functional analogue of hypre's GMRES (``krylov/gmres.c``): left-preconditioned
(hypre's loop computes w = precond(A v)), restart length ``k_dim``, Givens-
rotation least-squares update, residual recomputed from scratch at each
restart so the convergence decision is made on a true residual.

TPU-specific design: instead of modified Gram-Schmidt's j sequential inner
products per step (j round-trip reductions — latency-bound on any parallel
machine, which is why hypre grew COGMRES, ``krylov/cogmres.c``), we
orthogonalize with *classical Gram-Schmidt applied twice* (CGS2): two
(k+1, n) x (n,) matvecs against the stored basis per step. CGS2 has MGS-grade
numerical robustness and maps the whole orthogonalization onto the MXU with
exactly two reductions per step — this is hypre's own communication-reducing
COGMRES idea, adopted here as the default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.krylov.base import LinearOp, identity_precond
from hypre_tpu.seq.vector import dot, norm2


def gmres(
    A: LinearOp,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M: Optional[LinearOp] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    k_dim: int = 30,
    gs_passes: int = 2,
    logging: int = 0,
) -> tuple[jax.Array, ConvergenceInfo]:
    """logging > 0 records per-iteration (preconditioned) residual norms —
    the Givens-rotation estimates hypre's GMRES logs (gmres.c norms[]) —
    into info.res_history."""
    M = M or identity_precond
    x = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    dtype = b.dtype

    z_b = M(b)
    den = norm2(z_b)
    tol = jnp.maximum(rtol * den, atol)

    def arnoldi_step(j, carry):
        V, R, cs, sn, g, m, active, norms, it0 = carry
        w = M(A(V[j]))
        # CGS2: project against rows 0..j (static-shape masked matvecs)
        row_mask = (jnp.arange(V.shape[0]) <= j).astype(dtype)
        h1 = (V @ w) * row_mask
        w = w - h1 @ V
        h = h1
        if gs_passes >= 2:
            h2 = (V @ w) * row_mask
            w = w - h2 @ V
            h = h1 + h2
        h_next = norm2(w)
        V = V.at[j + 1].set(jnp.where(h_next > 0, w / jnp.where(h_next > 0, h_next, 1.0), 0))

        # apply previous Givens rotations to the new column
        def rot(i, hv):
            hi, hi1 = hv[i], hv[i + 1]
            applied = i < j
            new_hi = jnp.where(applied, cs[i] * hi + sn[i] * hi1, hi)
            new_hi1 = jnp.where(applied, -sn[i] * hi + cs[i] * hi1, hi1)
            return hv.at[i].set(new_hi).at[i + 1].set(new_hi1)

        hcol = jnp.zeros(V.shape[0], dtype).at[: h.shape[0]].set(h)
        hcol = hcol.at[j + 1].set(h_next)
        hcol = jax.lax.fori_loop(0, R.shape[1], rot, hcol)
        hj, hj1 = hcol[j], hcol[j + 1]
        denom = jnp.sqrt(hj * hj + hj1 * hj1)
        safe = jnp.where(denom > 0, denom, 1.0)
        c_new = jnp.where(denom > 0, hj / safe, 1.0)
        s_new = jnp.where(denom > 0, hj1 / safe, 0.0)
        hcol = hcol.at[j].set(c_new * hj + s_new * hj1).at[j + 1].set(0.0)

        gj = g[j]
        g_new = g.at[j].set(c_new * gj).at[j + 1].set(-s_new * gj)
        res_est = jnp.abs(g_new[j + 1])

        V_out = jnp.where(active, V, carry[0])
        R_out = jnp.where(active, R.at[:, j].set(hcol[: R.shape[0]]), R)
        cs_out = jnp.where(active, cs.at[j].set(c_new), cs)
        sn_out = jnp.where(active, sn.at[j].set(s_new), sn)
        g_out = jnp.where(active, g_new, g)
        m_out = jnp.where(active, j + 1, m)
        if logging > 0:
            norms = jnp.where(
                active, norms.at[it0 + j + 1].set(res_est), norms
            )
        # stop extending the basis once converged or on lucky breakdown
        active_out = active & (res_est > tol) & (h_next > 0)
        return (V_out, R_out, cs_out, sn_out, g_out, m_out, active_out,
                norms, it0)

    def restart_cycle(state):
        x, r_norm, it, _, norms = state
        r = b - A(x)
        z = M(r)
        beta = norm2(z)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((k_dim + 1, n), dtype).at[0].set(z / safe_beta)
        R = jnp.zeros((k_dim + 1, k_dim), dtype)
        cs = jnp.zeros(k_dim, dtype)
        sn = jnp.zeros(k_dim, dtype)
        g = jnp.zeros(k_dim + 1, dtype).at[0].set(beta)
        m0 = jnp.int32(0)
        carry = (V, R, cs, sn, g, m0, beta > tol, norms, it)
        V, R, cs, sn, g, m, _, norms, _ = jax.lax.fori_loop(
            0, k_dim, arnoldi_step, carry
        )

        # masked upper-triangular solve R[:m,:m] y = g[:m]
        cols = jnp.arange(k_dim)
        diag_fix = jnp.where(cols >= m, 1.0, 0.0).astype(dtype)
        Rhat = R[:k_dim, :] + jnp.diag(diag_fix)
        ghat = jnp.where(cols < m, g[:k_dim], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rhat, ghat, lower=False)
        x = x + y @ V[:k_dim]

        # true preconditioned residual decides convergence (hypre gmres.c
        # "check for convergence by evaluating the actual residual")
        r = b - A(x)
        r_norm_true = norm2(M(r))
        return (x, r_norm_true, it + m, r_norm_true <= tol, norms)

    def cond(state):
        _, r_norm, it, converged, _ = state
        return (~converged) & (it < maxiter) & jnp.isfinite(r_norm)

    r0_norm = norm2(M(b - A(x)))
    if logging > 0:
        norms0 = jnp.full(maxiter + k_dim + 1, -1.0, dtype).at[0].set(r0_norm)
    else:
        norms0 = jnp.zeros((0,), dtype)
    state = (x, r0_norm, jnp.int32(0), r0_norm <= tol, norms0)
    x, r_norm, iters, converged, norms = jax.lax.while_loop(
        cond, restart_cycle, state
    )

    rel = r_norm / jnp.where(den > 0, den, 1.0)
    return x, make_convergence_info(
        iters, rel, converged | (den == 0),
        res_history=norms[: maxiter + 1] if logging > 0 else None,
    )
