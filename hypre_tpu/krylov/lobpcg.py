"""LOBPCG — locally-optimal block preconditioned conjugate gradients.

Analogue of hypre's LOBPCG eigensolver (``krylov/lobpcg.c:208``,
``HYPRE_lobpcg.c:401``) for the smallest eigenpairs of A x = λ B x.

hypre runs LOBPCG over an abstract ``mv_MultiVector`` + interpreter vtable
(``multivector/interpreter.h:13-51``) with dense sub-problems in bundled
LAPACK (``lobpcg_solveGEVP``). The TPU formulation: a multivector IS an
(n, m) array — block operations are single MXU matmuls — and the projected
(3m × 3m) generalized eigenproblem is solved on device with ``jnp.eigh``
after B-whitening with a spectral cutoff (which also absorbs the rank
deficiency of the padded P block on the first iteration, so the whole solve
is one static-shape ``lax.while_loop``).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from hypre_tpu.krylov.base import LinearOp


def _whiten(M: jax.Array, cutoff: float):
    """M^{-1/2} via eigh with relative spectral cutoff (rank-safe).

    Returns (W, keep): dropped directions get zero columns in W; ``keep``
    marks the retained ones so the caller can exile the null space's
    spurious zero eigenvalues above the spectrum of interest.
    """
    w, V = jnp.linalg.eigh(M)
    wmax = jnp.maximum(jnp.max(w), 1e-300)
    # never let the cutoff drop below the eigh noise floor of the working
    # precision: f32 Gram eigenvalues carry ~1e-6 relative error and a
    # smaller cutoff admits tiny negatives into the 1/sqrt (NaNs)
    eps = jnp.finfo(M.dtype).eps
    cutoff = jnp.maximum(cutoff, 50 * eps)
    keep = w > cutoff * wmax
    inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, w, 1.0)), 0.0)
    return V * inv_sqrt[None, :], keep  # M^{-1/2} = V diag(w^-1/2)


def lobpcg(
    A: LinearOp,
    X0: jax.Array,
    B: Optional[LinearOp] = None,
    T: Optional[LinearOp] = None,
    tol: float = 1e-6,
    maxiter: int = 100,
    cutoff: float = 1e-10,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Compute the m smallest eigenpairs; X0 is the (n, m) initial block.

    A, B, T act column-wise on (n, m) multivectors (pass vmapped single-vector
    operators through ``block_op`` if needed). Returns (eigenvalues (m,),
    eigenvectors (n, m), residual norms (m,)).
    """
    Bop = B or (lambda V: V)
    Top = T or (lambda V: V)
    n, m = X0.shape
    dtype = X0.dtype

    def rayleigh_ritz(S):
        """Project, whiten, solve the small GEVP; return (theta, C)."""
        AS = A(S)
        BS = Bop(S)
        G = S.T @ AS
        Mb = S.T @ BS
        G = 0.5 * (G + G.T)
        Mb = 0.5 * (Mb + Mb.T)
        W, keep = _whiten(Mb, cutoff)
        Gw = W.T @ G @ W
        # dropped basis directions leave zero rows/cols in Gw whose spurious
        # 0-eigenvalues would sort below the physical spectrum — exile them
        big = 2.0 * jnp.max(jnp.abs(Gw)) + 1.0
        Gw = Gw + jnp.diag(jnp.where(keep, 0.0, big))
        theta, Y = jnp.linalg.eigh(0.5 * (Gw + Gw.T))
        C = W @ Y
        return theta, C

    # B-orthonormalize the initial block via one Rayleigh-Ritz on X alone
    def init_rr(X):
        theta, C = rayleigh_ritz(X)
        return X @ C[:, :m], theta[:m]

    X, lam = init_rr(X0)

    def residual(X, lam):
        return A(X) - Bop(X) * lam[None, :]

    def body(state):
        X, P, lam, _, it = state
        R = residual(X, lam)
        Wv = Top(R)
        S = jnp.concatenate([X, Wv, P], axis=1)  # (n, 3m) static
        theta, C = rayleigh_ritz(S)
        Cm = C[:, :m]
        X_new = S @ Cm
        # P = W,P components of the update (standard LOBPCG recombination)
        Cp = Cm.at[:m, :].set(0.0)
        P_new = S @ Cp
        # normalize P columns to keep the basis well-scaled
        pn = jnp.linalg.norm(P_new, axis=0)
        P_new = P_new / jnp.where(pn > 0, pn, 1.0)[None, :]
        lam_new = theta[:m]
        rn = jnp.linalg.norm(residual(X_new, lam_new), axis=0)
        return (X_new, P_new, lam_new, rn, it + 1)

    def cond(state):
        _, _, lam, rn, it = state
        scale = jnp.maximum(jnp.abs(lam), 1.0)
        return jnp.any(rn > tol * scale) & (it < maxiter)

    R0 = residual(X, lam)
    rn0 = jnp.linalg.norm(R0, axis=0)
    P0 = jnp.zeros((n, m), dtype)
    X, _, lam, rn, _ = jax.lax.while_loop(cond, body, (X, P0, lam, rn0, jnp.int32(0)))
    return lam, X, rn


def block_op(op: LinearOp) -> Callable[[jax.Array], jax.Array]:
    """Lift a single-vector operator to (n, m) multivectors (the
    mv_InterfaceInterpreter adapter, collapsed to a vmap)."""
    return lambda V: jax.vmap(op, in_axes=1, out_axes=1)(V)
