"""LGMRES — GMRES augmented with previous-restart error approximations.

Analogue of hypre's LGMRES (``krylov/lgmres.c``, Baker/Jessup/Manteuffel):
each restart builds an m-step Arnoldi basis from the current residual, then
extends the subspace with the last ``aug_dim`` correction vectors from
earlier restarts, damping the alternating behavior of plain restarted GMRES.

Implementation: the arnoldi loop runs m + aug_dim steps; step j's operator
input is V[j] for j < m and the stored augmentation vector for j >= m. The
solution update runs through the *inputs* (V rows / aug vectors), and the new
correction x_new - x_old becomes the next augmentation vector.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.krylov.base import LinearOp, identity_precond
from hypre_tpu.seq.vector import norm2


def lgmres(
    A: LinearOp,
    b: jax.Array,
    x0: Optional[jax.Array] = None,
    M: Optional[LinearOp] = None,
    rtol: float = 1e-8,
    atol: float = 0.0,
    maxiter: int = 1000,
    k_dim: int = 20,
    aug_dim: int = 2,
) -> tuple[jax.Array, ConvergenceInfo]:
    M = M or identity_precond
    x = jnp.zeros_like(b) if x0 is None else x0
    n = b.shape[0]
    dtype = b.dtype
    total = k_dim + aug_dim

    z_b = M(b)
    den = norm2(z_b)
    tol = jnp.maximum(rtol * den, atol)

    def arnoldi_step(j, carry):
        V, AUG, n_aug, R, cs, sn, g, m, active = carry
        # inputs: Krylov vector for j < k_dim, augmentation vector after
        aug_idx = jnp.clip(j - k_dim, 0, aug_dim - 1)
        u = jnp.where(j < k_dim, V[jnp.minimum(j, k_dim)], AUG[aug_idx])
        w = M(A(u))
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

        # steps beyond the available augmentation count are inert
        usable = (j < k_dim) | (j - k_dim < n_aug)
        live = active & usable
        V_out = jnp.where(live, V, carry[0])
        R_out = jnp.where(live, R.at[:, j].set(hcol[: R.shape[0]]), R)
        cs_out = jnp.where(live, cs.at[j].set(c_new), cs)
        sn_out = jnp.where(live, sn.at[j].set(s_new), sn)
        g_out = jnp.where(live, g_new, g)
        m_out = jnp.where(live, j + 1, m)
        active_out = active & ((res_est > tol) | ~usable) & ((h_next > 0) | ~usable)
        return (V_out, AUG, n_aug, R_out, cs_out, sn_out, g_out, m_out, active_out)

    def restart_cycle(state):
        x, AUG, n_aug, _, it, _ = state
        r = b - A(x)
        z = M(r)
        beta = norm2(z)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V = jnp.zeros((total + 1, n), dtype).at[0].set(z / safe_beta)
        R = jnp.zeros((total + 1, total), dtype)
        cs = jnp.zeros(total, dtype)
        sn = jnp.zeros(total, dtype)
        g = jnp.zeros(total + 1, dtype).at[0].set(beta)
        carry = (V, AUG, n_aug, R, cs, sn, g, jnp.int32(0), beta > tol)
        V, _, _, R, cs, sn, g, m, _ = jax.lax.fori_loop(0, total, arnoldi_step, carry)

        cols = jnp.arange(total)
        diag_fix = jnp.where(cols >= m, 1.0, 0.0).astype(dtype)
        Rhat = R[:total, :] + jnp.diag(diag_fix)
        ghat = jnp.where(cols < m, g[:total], 0.0)
        y = jax.scipy.linalg.solve_triangular(Rhat, ghat, lower=False)
        # update through the step inputs: V rows for the Krylov part,
        # augmentation vectors for the tail
        dx = y[:k_dim] @ V[:k_dim] + y[k_dim:] @ AUG
        x = x + dx

        # rotate the new correction into the augmentation store
        dx_norm = norm2(dx)
        dx_unit = jnp.where(dx_norm > 0, dx / jnp.where(dx_norm > 0, dx_norm, 1.0), 0)
        if aug_dim > 0:
            AUG = jnp.roll(AUG, 1, axis=0).at[0].set(dx_unit)
            n_aug = jnp.minimum(n_aug + 1, aug_dim)

        r_norm_true = norm2(M(b - A(x)))
        return (x, AUG, n_aug, r_norm_true, it + m, r_norm_true <= tol)

    def cond(state):
        _, _, _, r_norm, it, converged = state
        return (~converged) & (it < maxiter) & jnp.isfinite(r_norm)

    r0_norm = norm2(M(b - A(x)))
    AUG0 = jnp.zeros((max(aug_dim, 1), n), dtype)
    state = (x, AUG0, jnp.int32(0), r0_norm, jnp.int32(0), r0_norm <= tol)
    x, _, _, r_norm, iters, converged = jax.lax.while_loop(cond, restart_cycle, state)

    rel = r_norm / jnp.where(den > 0, den, 1.0)
    return x, make_convergence_info(iters, rel, converged | (den == 0))
