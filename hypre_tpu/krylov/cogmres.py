"""COGMRES — communication-optimal GMRES (hypre krylov/cogmres.c).

hypre's COGMRES (Swirydowicz/Thomas et al.) restructures Arnoldi so each
step needs ONE global reduction instead of modified Gram-Schmidt's j
sequential ones: the projection coefficients h = V w AND the norm bookkeeping
ride a single fused block inner product, and the orthogonalized vector's
norm comes from the Pythagorean identity

    ||w - V^T h||^2 = ||w||^2 - ||h||^2

instead of a second reduction (hypre's gs_option 1 "one-synchronization
CGS"; gs_option >= 2 adds a delayed reorthogonalization pass built from the
same fused product). On a TPU mesh the single reduction is one psum, so the
latency per Arnoldi step is constant in the basis size — the same scaling
property the algorithm buys hypre at high rank counts.

The subtlety the Pythagorean form introduces — cancellation when w is
nearly in span(V) — is handled as in the reference: if the computed
||w_perp||^2 falls below eps * ||w||^2 the step reorthogonalizes (the
delayed CGS2 correction), which is also what makes gs_passes=2 the robust
default.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.krylov.base import LinearOp, identity_precond
from hypre_tpu.seq.vector import norm2


def cogmres(
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
    """Restarted COGMRES; same stopping semantics as gmres()."""
    M = M or identity_precond
    x = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    dtype = b.dtype

    den = norm2(M(b))
    tol = jnp.maximum(rtol * den, atol)

    def arnoldi_step(j, carry):
        V, R, cs, sn, g, m, active = carry
        w = M(A(V[j]))
        row_mask = (jnp.arange(V.shape[0]) <= j).astype(dtype)
        # ONE fused reduction: [V w ; w.w] — the CO trick. (On a mesh this
        # is a single psum of a stacked block product.)
        h1 = (V @ w) * row_mask
        ww = jnp.dot(w, w)
        w1 = w - h1 @ V
        # Pythagorean norm of the projected remainder — no second reduction
        hh = jnp.dot(h1, h1)
        wperp2 = jnp.maximum(ww - hh, 0.0)
        h = h1
        if gs_passes >= 2:
            # delayed reorthogonalization (cancellation guard / gs_option 2+)
            h2 = (V @ w1) * row_mask
            w1 = w1 - h2 @ V
            h = h1 + h2
            wperp2 = jnp.maximum(wperp2 - jnp.dot(h2, h2), 0.0)
        h_next = jnp.sqrt(wperp2)
        V = V.at[j + 1].set(
            jnp.where(h_next > 0, w1 / jnp.where(h_next > 0, h_next, 1.0), 0)
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
        R_out = jnp.where(active, R.at[:, j].set(hcol[: R.shape[0]]), R)
        cs_out = jnp.where(active, cs.at[j].set(c_new), cs)
        sn_out = jnp.where(active, sn.at[j].set(s_new), sn)
        g_out = jnp.where(active, g_new, g)
        m_out = jnp.where(active, j + 1, m)
        active_out = active & (res_est > tol) & (h_next > 0)
        return (V_out, R_out, cs_out, sn_out, g_out, m_out, active_out)

    def restart_cycle(state):
        x, r_norm, it, _ = state
        r = b - A(x)
        z = M(r)
        beta = norm2(z)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((k_dim + 1, n), dtype).at[0].set(z / safe_beta)
        R = jnp.zeros((k_dim + 1, k_dim), dtype)
        cs = jnp.zeros(k_dim, dtype)
        sn = jnp.zeros(k_dim, dtype)
        g = jnp.zeros(k_dim + 1, dtype).at[0].set(beta)
        carry = (V, R, cs, sn, g, jnp.int32(0), beta > tol)
        V, R, cs, sn, g, m, _ = jax.lax.fori_loop(0, k_dim, arnoldi_step, carry)

        cols = jnp.arange(k_dim)
        diag_fix = jnp.where(cols >= m, 1.0, 0.0).astype(dtype)
        Rhat = R[:k_dim, :] + jnp.diag(diag_fix)
        ghat = jnp.where(cols < m, g[:k_dim], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rhat, ghat, lower=False)
        x = x + y @ V[:k_dim]

        r = b - A(x)
        r_norm_true = norm2(M(r))
        return (x, r_norm_true, it + m, r_norm_true <= tol)

    def cond(state):
        _, r_norm, it, converged = state
        return (~converged) & (it < maxiter) & jnp.isfinite(r_norm)

    r0_norm = norm2(M(b - A(x)))
    state = (x, r0_norm, jnp.int32(0), r0_norm <= tol)
    x, r_norm, iters, converged = jax.lax.while_loop(cond, restart_cycle, state)

    rel = r_norm / jnp.where(den > 0, den, 1.0)
    return x, make_convergence_info(iters, rel, converged | (den == 0))
