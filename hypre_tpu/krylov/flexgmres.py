"""FlexGMRES — GMRES with a variable (flexible) preconditioner.

Analogue of hypre's FlexGMRES (``krylov/flexgmres.c``): right-preconditioned,
storing the preconditioned vectors Z[j] = M_j(V[j]) so the preconditioner may
change between steps (e.g. an inner iterative solve). Orthogonalization is
CGS2 like ``gmres.py``; the residual estimate is in the unpreconditioned
two-norm since the preconditioner acts on the right.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.krylov.base import LinearOp, identity_precond
from hypre_tpu.seq.vector import norm2


def flexgmres(
    A: LinearOp,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M: Optional[LinearOp] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    k_dim: int = 30,
) -> tuple[jax.Array, ConvergenceInfo]:
    M = M or identity_precond
    x = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    dtype = b.dtype

    den = norm2(b)
    tol = jnp.maximum(rtol * den, atol)

    def arnoldi_step(j, carry):
        V, Z, R, cs, sn, g, m, active = carry
        z = M(V[j])
        Z = Z.at[j].set(z)
        w = A(z)
        row_mask = (jnp.arange(V.shape[0]) <= j).astype(dtype)
        h1 = (V @ w) * row_mask
        w = w - h1 @ V
        h2 = (V @ w) * row_mask
        w = w - h2 @ V
        h = h1 + h2
        h_next = norm2(w)
        V = V.at[j + 1].set(
            jnp.where(h_next > 0, w / jnp.where(h_next > 0, h_next, 1.0), 0)
        )

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
        Z_out = jnp.where(active, Z, carry[1])
        R_out = jnp.where(active, R.at[:, j].set(hcol[: R.shape[0]]), R)
        cs_out = jnp.where(active, cs.at[j].set(c_new), cs)
        sn_out = jnp.where(active, sn.at[j].set(s_new), sn)
        g_out = jnp.where(active, g_new, g)
        m_out = jnp.where(active, j + 1, m)
        active_out = active & (res_est > tol) & (h_next > 0)
        return (V_out, Z_out, R_out, cs_out, sn_out, g_out, m_out, active_out)

    def restart_cycle(state):
        x, _, it, _ = state
        r = b - A(x)
        beta = norm2(r)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((k_dim + 1, n), dtype).at[0].set(r / safe_beta)
        Z = jnp.zeros((k_dim, n), dtype)
        R = jnp.zeros((k_dim + 1, k_dim), dtype)
        cs = jnp.zeros(k_dim, dtype)
        sn = jnp.zeros(k_dim, dtype)
        g = jnp.zeros(k_dim + 1, dtype).at[0].set(beta)
        carry = (V, Z, R, cs, sn, g, jnp.int32(0), beta > tol)
        V, Z, R, cs, sn, g, m, _ = jax.lax.fori_loop(0, k_dim, arnoldi_step, carry)

        cols = jnp.arange(k_dim)
        diag_fix = jnp.where(cols >= m, 1.0, 0.0).astype(dtype)
        Rhat = R[:k_dim, :] + jnp.diag(diag_fix)
        ghat = jnp.where(cols < m, g[:k_dim], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rhat, ghat, lower=False)
        x = x + y @ Z  # flexible update through the stored Z basis

        r_norm_true = norm2(b - A(x))
        return (x, r_norm_true, it + m, r_norm_true <= tol)

    def cond(state):
        _, r_norm, it, converged = state
        return (~converged) & (it < maxiter) & jnp.isfinite(r_norm)

    r0_norm = norm2(b - A(x))
    state = (x, r0_norm, jnp.int32(0), r0_norm <= tol)
    x, r_norm, iters, converged = jax.lax.while_loop(cond, restart_cycle, state)

    rel = r_norm / jnp.where(den > 0, den, 1.0)
    return x, make_convergence_info(iters, rel, converged | (den == 0))
