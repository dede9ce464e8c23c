"""AIR — approximate ideal restriction for nonsymmetric AMG.

Analogue of hypre's lAIR (``parcsr_ls/par_restr.c``, ``par_lr_restr.c``;
dispatch at ``par_amg_setup.c:1987-2007``): for advection-dominated and
otherwise nonsymmetric operators, Galerkin R = P^T transfers along the wrong
direction. The ideal restriction is R = [-A_CF A_FF^{-1}  I]; distance-1
lAIR approximates each C-row locally — for C-point i with strong F-neighbor
set J_i:

    r_i A[J_i, J_i] = -A[i, J_i]    (one small dense solve per C-point)

which on TPU is a single batched (nc, k, k) transposed solve over a padded
pattern — the same shape as the FSAI setup. Pairs with one-point/direct
interpolation and an F-then-C relaxation ordering in hypre; here with the
standard smoother menu (use GMRES/BiCGSTAB outside: the cycle is
nonsymmetric by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hypre_tpu.amg.coarsen import C_PT
from hypre_tpu.core.config import PAD_COL
from hypre_tpu.precond.common import lookup
from hypre_tpu.seq.ell import EllMatrix
from hypre_tpu.seq.spgemm import ell_filter


def air_restriction(
    A: EllMatrix, S: jax.Array, cf: jax.Array, cmap: jax.Array, n_coarse: int
) -> EllMatrix:
    """Build R (n_coarse x n_fine) with distance-1 lAIR weights."""
    n, k = A.cols.shape
    cols_c = jnp.maximum(A.cols, 0)
    # per-row pattern: strong F-neighbors (J_i), padded with -1
    is_f_col = S & (cf[cols_c] != C_PT)
    patt = jnp.where(is_f_col, A.cols, PAD_COL)
    order = jnp.argsort(jnp.where(patt >= 0, patt, jnp.int32(2**30)), axis=1)
    patt = jnp.take_along_axis(patt, order, axis=1)  # sorted, pads at end

    # dense local blocks A[J_i, J_i]
    rows_b = jnp.broadcast_to(patt[:, :, None], (n, k, k))
    cols_b = jnp.broadcast_to(patt[:, None, :], (n, k, k))
    sub = lookup(A, rows_b, cols_b)
    valid = patt >= 0
    pair = valid[:, :, None] & valid[:, None, :]
    sub = jnp.where(pair, sub, jnp.eye(k, dtype=A.dtype)[None])

    # rhs: -A[i, J_i]
    row_ids = jnp.broadcast_to(jnp.arange(n, dtype=patt.dtype)[:, None], patt.shape)
    rhs = -jnp.where(valid, lookup(A, row_ids, patt), 0.0)

    # r_i solves r_i A[J,J] = rhs  =>  A[J,J]^T r_i^T = rhs^T
    w = jnp.linalg.solve(jnp.swapaxes(sub, 1, 2), rhs[..., None])[..., 0]
    w = jnp.where(valid, w, 0.0)

    # assemble R rows for C-points only: [w at J_i, 1 at i]
    is_c = cf == C_PT
    r_cols = jnp.concatenate(
        [jnp.where(is_c[:, None], patt, PAD_COL),
         jnp.where(is_c, jnp.arange(n, dtype=patt.dtype), PAD_COL)[:, None]],
        axis=1,
    )
    r_vals = jnp.concatenate(
        [jnp.where(is_c[:, None], w, 0.0),
         jnp.where(is_c, 1.0, 0.0).astype(A.dtype)[:, None]],
        axis=1,
    )
    # compress to the coarse row space: keep C rows in cmap order (cmap is
    # the positional cumsum, so boolean selection preserves it)
    import numpy as np

    keep = np.asarray(is_c)
    R = EllMatrix(
        vals=jnp.asarray(np.asarray(r_vals)[keep]),
        cols=jnp.asarray(np.asarray(r_cols)[keep]),
        n_cols=n,
    )
    R = ell_filter(R, R.structural_mask())
    width = int(jnp.max(jnp.sum(R.structural_mask(), axis=1)))
    return EllMatrix(
        vals=R.vals[:, : max(width, 1)],
        cols=R.cols[:, : max(width, 1)],
        n_cols=n,
    )
