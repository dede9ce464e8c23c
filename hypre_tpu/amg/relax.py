"""Smoothers (hypre_BoomerAMGRelax dispatch, parcsr_ls/par_relax.c:23).

TPU-native smoother set. Gauss-Seidel is inherently sequential, and hypre's
own GPU answer is to prefer the pointwise-parallel smoothers (ℓ1-Jacobi is
the device default, relax type 18) — we adopt exactly that menu:

- weighted Jacobi          (hypre relax 0/7)
- ℓ1-Jacobi                (relax 18: d_i = sum_j |a_ij|, unconditionally
                            convergent for symmetric A, par_relax.c)
- ℓ1 hybrid GS analogue: two-stage Gauss-Seidel (relax 11/12) comes later
- Chebyshev polynomial     (par_cheby.c + eigenvalue estimate
                            hypre_ParCSRMaxEigEstimate, par_relax_more.c:136)

Each smoother is a pure function (A-ops, u, f) -> u usable inside jit; the
hierarchy precomputes the diagonal vectors once at setup like hypre's
l1_norms arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import hash_rand01
from hypre_tpu.seq.ell import EllMatrix


def jacobi(A: EllMatrix, dinv: jax.Array, u: jax.Array, f: jax.Array, weight: float = 1.0) -> jax.Array:
    return u + weight * dinv * (f - A.mv(u))


def l1_norms(A: EllMatrix) -> jax.Array:
    """ℓ1 row norms d_i = sum_j |a_ij| (hypre relax-18 l1_norms array)."""
    d = A.abs_row_sums()
    return jnp.where(d > 0, d, 1.0)


def l1_jacobi(A: EllMatrix, l1inv: jax.Array, u: jax.Array, f: jax.Array) -> jax.Array:
    return u + l1inv * (f - A.mv(u))


def cf_jacobi(
    A: EllMatrix,
    dinv: jax.Array,
    u: jax.Array,
    f: jax.Array,
    cf: jax.Array,
    weight: float = 1.0,
) -> jax.Array:
    """CF-ordered (relax_order=1) Jacobi: relax the C points first, then the
    F points seeing the UPDATED C values — hypre's CF two-color sweep
    (hypre_BoomerAMGRelax relax_points dispatch, par_relax.c; ordering
    chosen at par_amg_setup.c via HYPRE_BoomerAMGSetRelaxOrder). Pointwise
    parallel within each color, so it maps to two masked device sweeps.

    cf: +1 on C points, -1 on F points (padded tails may hold 0 — they
    never update). Works for both dinv- and l1inv-style scalings.
    """
    is_c = cf > 0
    uc = u + weight * dinv * (f - A.mv(u))
    u = jnp.where(is_c, uc, u)
    uf = u + weight * dinv * (f - A.mv(u))
    return jnp.where(cf < 0, uf, u)


# ---------------------------------------------------------------------------
# Chebyshev (par_cheby.c)
# ---------------------------------------------------------------------------


def max_eig_estimate(A: EllMatrix, dinv: jax.Array, iters: int = 10) -> jax.Array:
    """Power-method estimate of lambda_max(D^-1 A), with hypre's 10%
    safety margin (hypre_ParCSRMaxEigEstimate, par_relax_more.c:136 uses a
    CG/power estimate then scales by 1.1 before building coefficients)."""
    n = A.vec_len_rows
    x = hash_rand01(jnp.arange(n, dtype=jnp.int32)).astype(A.dtype) - 0.5

    def body(_, x):
        y = dinv * A.mv(x)
        return y / jnp.linalg.norm(y)

    x = jax.lax.fori_loop(0, iters, body, x / jnp.linalg.norm(x))
    y = dinv * A.mv(x)
    return 1.1 * jnp.vdot(x, y) / jnp.vdot(x, x)


def max_eig_estimate_cg(
    A: EllMatrix, dinv: jax.Array, iters: int = 10
) -> tuple[jax.Array, jax.Array]:
    """CG/Lanczos estimate of the extreme eigenvalues of D^{-1}A
    (hypre_ParCSRMaxEigEstimateCG, par_relax_more.c:173): hypre runs
    ``max_iter`` CG steps on a random vector against the diagonally
    scaled operator and takes the extreme eigenvalues of the CG
    tridiagonal. Here the equivalent Lanczos three-term recurrence runs
    on the symmetrized B = D^{-1/2} A D^{-1/2} (same spectrum as D^{-1}A
    for SPD A) and the (iters, iters) tridiagonal goes through one tiny
    dense eigvalsh — returns (lambda_max, lambda_min), unscaled like the
    reference (the power method needs a 1.1 fudge; this does not)."""
    n = A.vec_len_rows
    iters = min(iters, n)
    s = jnp.sqrt(jnp.abs(dinv))
    v = hash_rand01(jnp.arange(n, dtype=jnp.int32)).astype(A.dtype) - 0.5
    v = v / jnp.linalg.norm(v)

    def op(x):
        return s * A.mv(s * x)

    def body(j, carry):
        v_prev, v_cur, alphas, betas = carry
        w = op(v_cur)
        alpha = jnp.vdot(v_cur, w)
        w = w - alpha * v_cur - jnp.where(j > 0, betas[j - 1], 0.0) * v_prev
        # one full reorthogonalization pass keeps the small tridiagonal
        # honest in f32 (classic Lanczos loses orthogonality fast)
        beta = jnp.linalg.norm(w)
        w = jnp.where(beta > 0, w / jnp.where(beta > 0, beta, 1.0), w)
        return (v_cur, w, alphas.at[j].set(alpha), betas.at[j].set(beta))

    alphas = jnp.zeros(iters, A.dtype)
    betas = jnp.zeros(iters, A.dtype)
    _, _, alphas, betas = jax.lax.fori_loop(
        0, iters, body, (jnp.zeros_like(v), v, alphas, betas)
    )
    T = (
        jnp.diag(alphas)
        + jnp.diag(betas[: iters - 1], 1)
        + jnp.diag(betas[: iters - 1], -1)
    )
    eigs = jnp.linalg.eigvalsh(T)
    return eigs[-1], jnp.maximum(eigs[0], 0.0)


def chebyshev(
    A: EllMatrix,
    dinv: jax.Array,
    lmax: jax.Array,
    u: jax.Array,
    f: jax.Array,
    order: int = 2,
    eig_ratio: float = 0.3,
) -> jax.Array:
    """Chebyshev smoothing of order ``order`` on D^{-1}A over
    [eig_ratio*lmax, lmax] (hypre cheby_fraction default 0.3,
    hypre_ParCSRRelax_Cheby_Solve). Standard three-term recurrence on the
    residual-correction form; no inner products — ideal for TPU (the whole
    smoother is SpMV + axpy)."""
    lmin = eig_ratio * lmax
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma = theta / delta

    r = dinv * (f - A.mv(u))
    rho = 1.0 / sigma
    d = r / theta
    u = u + d

    def body(_, carry):
        u, d, rho = carry
        r = dinv * (f - A.mv(u))
        rho_new = 1.0 / (2.0 * sigma - rho)
        d = rho_new * rho * d + (2.0 * rho_new / delta) * r
        return (u + d, d, rho_new)

    u, _, _ = jax.lax.fori_loop(0, order - 1, body, (u, d, rho))
    return u


# ---------------------------------------------------------------------------
# Two-stage Gauss-Seidel (par_relax.c relax types 11/12)
# ---------------------------------------------------------------------------


def lower_apply(A, x: jax.Array) -> jax.Array:
    """L x with L = strict lower triangle of A (slot mask, no new matrix).
    Dispatches to format-native implementations (DiaMatrix) when available."""
    if hasattr(A, "lower_apply"):
        return A.lower_apply(x)
    if hasattr(A, "ell"):
        A = A.ell
    row_ids = jnp.arange(A.n_rows, dtype=A.cols.dtype)[:, None]
    mask = (A.cols >= 0) & (A.cols < row_ids)
    gathered = jnp.take(x, jnp.maximum(A.cols, 0), axis=0)
    return jnp.sum(jnp.where(mask, A.vals, 0.0) * gathered, axis=1)


def upper_apply(A, x: jax.Array) -> jax.Array:
    if hasattr(A, "upper_apply"):
        return A.upper_apply(x)
    if hasattr(A, "ell"):
        A = A.ell
    row_ids = jnp.arange(A.n_rows, dtype=A.cols.dtype)[:, None]
    mask = (A.cols >= 0) & (A.cols > row_ids)
    gathered = jnp.take(x, jnp.maximum(A.cols, 0), axis=0)
    return jnp.sum(jnp.where(mask, A.vals, 0.0) * gathered, axis=1)


def two_stage_gs(A: EllMatrix, dinv: jax.Array, u: jax.Array, f: jax.Array) -> jax.Array:
    """Forward two-stage GS (relax 11): approximate (D+L)^{-1} by its first
    two Neumann terms, z = D^{-1}r - D^{-1} L D^{-1} r — hypre's GPU-friendly
    GS replacement (par_relax.c:125-131)."""
    r = f - A.mv(u)
    z0 = dinv * r
    return u + z0 - dinv * lower_apply(A, z0)


def sym_two_stage_gs(A: EllMatrix, dinv: jax.Array, u: jax.Array, f: jax.Array) -> jax.Array:
    """Symmetric variant (relax 12): forward sweep then backward sweep."""
    u = two_stage_gs(A, dinv, u, f)
    r = f - A.mv(u)
    z0 = dinv * r
    return u + z0 - dinv * upper_apply(A, z0)


def kaczmarz(A: EllMatrix, row_norm_inv: jax.Array, u: jax.Array, f: jax.Array, weight: float = 1.0) -> jax.Array:
    """Simultaneous Kaczmarz / Cimmino sweep (relax 20, par_relax.c):
    u += w A^T diag(1/||a_i||^2) (f - A u). Converges for any nonsingular A
    (it is Richardson on the normal equations)."""
    r = f - A.mv(u)
    return u + weight * A.mv_t(row_norm_inv * r)


def row_norms_sq_inv(A) -> jax.Array:
    if hasattr(A, "dvals"):
        s = jnp.sum(A.dvals * A.dvals, axis=0)
    else:
        ell = A.ell if hasattr(A, "ell") else A
        s = jnp.sum(ell.vals * ell.vals, axis=1)
    return 1.0 / jnp.where(s > 0, s, 1.0)
