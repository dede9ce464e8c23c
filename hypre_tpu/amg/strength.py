"""Strength of connection (hypre_BoomerAMGCreateS, parcsr_ls/par_strength.c:531).

hypre materializes the strength graph S as a separate CSR matrix; here S is a
*boolean mask aligned with A's ELL slots* — a (n, k) array marking which
entries of A are strong. This avoids a matrix build entirely: coarsening and
interpolation gather through A.cols with the mask applied, which is exactly
the access pattern the TPU's vector units want.

Classical definition (both-sign version, as in hypre): entry (i,j) is strong
iff  -sign(a_ii) * a_ij >= theta * max_{k != i} ( -sign(a_ii) * a_ik ).
Rows whose largest off-diagonal candidate is <= 0 have no strong connections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hypre_tpu.seq.ell import EllMatrix


def strength_mask(
    A: EllMatrix, theta: float = 0.25, max_row_sum: float = 1.0
) -> jax.Array:
    """Boolean (n, k) mask over A's slots: True = strong connection.

    max_row_sum < 1 applies hypre's weak-dependence cutoff
    (HYPRE_BoomerAMGSetMaxRowSum, default 0.9; hypre_BoomerAMGCreateS
    par_strength.c:531): a strongly diagonally dominant row — where the
    off-diagonal mass fails to cancel the diagonal, |sum_j a_ij| >
    max_row_sum * |a_ii| (Dirichlet rows, shifted/mass-matrix-like rows) —
    smooths so well that pointwise relaxation handles it alone; all of its
    dependencies are marked weak so it coarsens as an isolated F point."""
    offd = A.offdiag_mask()
    diag = A.diagonal()
    sign = jnp.where(diag >= 0, 1.0, -1.0).astype(A.dtype)
    cand = jnp.where(offd, -sign[:, None] * A.vals, -jnp.inf)
    row_max = jnp.max(cand, axis=1)
    has_strong = row_max > 0
    thresh = theta * row_max
    S = offd & (cand >= thresh[:, None]) & has_strong[:, None] & (cand > 0)
    if max_row_sum < 1.0:
        row_sum = jnp.sum(jnp.where(offd, A.vals, 0), axis=1) + diag
        safe_d = jnp.where(diag != 0, diag, 1.0)
        dominant = jnp.abs(row_sum / safe_d) > max_row_sum
        S = S & ~dominant[:, None]
    return S


def strength_transpose_counts(A: EllMatrix, S: jax.Array) -> jax.Array:
    """|S^T_i| = number of points that strongly depend on i.

    hypre computes this as part of the PMIS measure (par_coarsen.c: the
    'measure array' from S transpose row sums); here it is one scatter-add.
    """
    cols = jnp.where(S, A.cols, A.n_rows)  # dump non-strong into overflow slot
    counts = jnp.zeros(A.n_rows + 1, jnp.int32).at[cols.reshape(-1)].add(1)
    return counts[:-1]
