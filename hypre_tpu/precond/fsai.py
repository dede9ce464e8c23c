"""FSAI — factored sparse approximate inverse preconditioner.

Analogue of hypre's FSAI (``parcsr_ls/par_fsai_setup.c:117-136``, new in
v2.25): build a sparse lower-triangular G ~= L^{-1} (A ~= L L^T), so
M = G^T G approximates A^{-1} and applying M is two SpMVs — no triangular
solves, no sequentiality: the ideal TPU/GPU preconditioner, which is exactly
why hypre added it for GPUs.

Per row i with lower-triangular pattern J_i (diagonal included):
solve A[J_i, J_i] y = e_i, then G[i, J_i] = y / sqrt(y_i). On TPU all rows
are one batched (n, k, k) Cholesky solve — hypre's per-row loop with dense
LAPACK calls becomes a single vmapped kernel.

v1 uses the static level-0 pattern (lower triangle of A); hypre's adaptive
Kaporin-gradient pattern growth is a planned extension.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.precond.common import gather_submatrices, row_pattern_lower
from hypre_tpu.seq.ell import EllMatrix, ell_spmv, ell_spmv_t


@dataclasses.dataclass
class FSAI:
    """HYPRE_FSAI* object protocol (HYPRE_parcsr_ls.h:1529)."""

    G: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "FSAI":
        pattern = row_pattern_lower(A)  # (n, k), sorted, -1 padded
        sub = gather_submatrices(A, pattern)  # (n, k, k) SPD blocks
        n, k = pattern.shape
        row_ids = jnp.arange(n, dtype=pattern.dtype)[:, None]
        rhs = (pattern == row_ids).astype(A.dtype)  # e_i at the diag slot
        # batched SPD solve (jnp.linalg.solve batches over leading dims)
        y = jnp.linalg.solve(sub, rhs[..., None])[..., 0]  # (n, k)
        yi = jnp.sum(jnp.where(pattern == row_ids, y, 0), axis=1)
        scale = 1.0 / jnp.sqrt(jnp.maximum(yi, 1e-300))
        vals = jnp.where(pattern >= 0, y * scale[:, None], 0.0)
        self.G = EllMatrix(vals=vals, cols=pattern, n_cols=A.n_cols)
        return self

    def precond(self):
        """M r = G^T (G r)  (par_fsai_solve.c applies the same pair)."""
        G = self.G
        assert G is not None, "call setup(A) first"
        return lambda r: ell_spmv_t(G, ell_spmv(G, r))
