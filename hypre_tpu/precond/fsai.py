"""FSAI — factored sparse approximate inverse preconditioner.

Analogue of hypre's FSAI (``parcsr_ls/par_fsai_setup.c``, new in v2.25):
build a sparse lower-triangular G ~= L^{-1} (A ~= L L^T), so M = G^T G
approximates A^{-1} and applying M is two SpMVs — no triangular solves, no
sequentiality: the ideal TPU/GPU preconditioner, which is exactly why hypre
added it for GPUs.

Per row i with lower-triangular pattern J_i: solve A[J_i, J_i] y = -A[J_i, i]
for the off-diagonal weights; the diagonal scaling makes (G A G^T) unit
diagonal. On TPU all rows are one batched (n, k, k) Cholesky-class solve —
hypre's per-row loop with dense LAPACK calls becomes a single vmapped kernel.

Pattern selection ("algo_type"):

- ``static``: level-0 pattern (lower triangle of A) — the cheap default.
- ``adaptive``: hypre's Kaporin-gradient growth
  (``par_fsai_setup.c:117-136``, hypre_FindKapGrad): start from the empty
  pattern and repeat ``max_steps`` times — solve the current local systems,
  score every candidate column c < i (the distance-1 expansion of the
  current pattern union A's own row) by the Kaporin gradient
  |(A g_i)_c| of the preconditioned-trace functional, and admit the
  ``max_step_size`` best. All rows grow in lockstep as batched slab ops.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import PAD_COL
from hypre_tpu.precond.common import gather_submatrices, lookup, row_pattern_lower
from hypre_tpu.seq.ell import EllMatrix, ell_spmv, ell_spmv_t
from hypre_tpu.seq.slabops import merge_slab


def _solve_rows(A: EllMatrix, pattern: jax.Array):
    """Batched local solves: G row weights on ``pattern`` (diag excluded
    from the pattern; it gets the 1/sqrt scaling slot). Returns (y, yi)
    with y the pattern weights of the UNSCALED row [w, 1] and yi the
    (i,i) value of the inverse-submatrix row (for the scaling)."""
    n, k = pattern.shape
    row_ids = jnp.arange(n, dtype=pattern.dtype)[:, None]
    full = jnp.concatenate([pattern, row_ids], axis=1)  # pattern + diagonal
    sub = gather_submatrices(A, full)  # (n, k+1, k+1)
    rhs = (full == row_ids).astype(A.dtype)
    y = jnp.linalg.solve(sub, rhs[..., None])[..., 0]  # (n, k+1)
    yi = y[:, -1]
    return y, yi, full


@dataclasses.dataclass
class FSAI:
    """HYPRE_FSAI* object protocol (HYPRE_parcsr_ls.h:1529)."""

    algo_type: str = "static"  # 'static' | 'adaptive' (hypre algo_type 1)
    max_steps: int = 3  # hypre HYPRE_FSAISetMaxSteps
    max_step_size: int = 3  # hypre HYPRE_FSAISetMaxStepSize
    kap_tolerance: float = 1e-3  # relative Kaporin improvement cutoff

    G: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "FSAI":
        if self.algo_type == "static":
            pattern = row_pattern_lower(A)
            sub = gather_submatrices(A, pattern)
            n, k = pattern.shape
            row_ids = jnp.arange(n, dtype=pattern.dtype)[:, None]
            rhs = (pattern == row_ids).astype(A.dtype)
            y = jnp.linalg.solve(sub, rhs[..., None])[..., 0]
            yi = jnp.sum(jnp.where(pattern == row_ids, y, 0), axis=1)
            scale = 1.0 / jnp.sqrt(jnp.maximum(yi, 1e-300))
            vals = jnp.where(pattern >= 0, y * scale[:, None], 0.0)
            self.G = EllMatrix(vals=vals, cols=pattern, n_cols=A.n_cols)
            return self
        return self._setup_adaptive(A)

    def _setup_adaptive(self, A: EllMatrix) -> "FSAI":
        n, kA = A.cols.shape
        row_ids = jnp.arange(n, dtype=jnp.int32)[:, None]
        width = self.max_steps * self.max_step_size
        # current pattern (strictly-lower columns), grown in place
        pattern = jnp.full((n, width), PAD_COL, jnp.int32)
        yi_prev = None

        for step in range(self.max_steps):
            y, yi, full = _solve_rows(A, pattern)
            if yi_prev is not None:
                # hypre's kap_tolerance: stop growing rows whose Kaporin
                # functional (1/yi) stopped improving — freeze via masking
                improved = yi > yi_prev * (1.0 + self.kap_tolerance)
            else:
                improved = jnp.ones(n, bool)
            yi_prev = yi
            if step == self.max_steps - 1:
                break
            # candidates: strictly-lower A-neighbors of i and of the
            # current pattern entries (distance-1 expansion)
            own = jnp.where(
                (A.cols >= 0) & (A.cols < row_ids), A.cols, PAD_COL
            )
            nb = A.cols[jnp.maximum(pattern, 0)]  # (n, width, kA)
            nb = jnp.where(
                (pattern[:, :, None] >= 0) & (nb >= 0) & (nb < row_ids[:, :, None]),
                nb, PAD_COL,
            ).reshape(n, width * kA)
            cand = jnp.concatenate([own, nb], axis=1)
            # drop candidates already in the pattern
            in_pat = jnp.any(
                cand[:, :, None] == pattern[:, None, :], axis=2
            )
            cand = jnp.where(in_pat, PAD_COL, cand)
            # Kaporin gradient |(A g)_c| with g the current unscaled row
            # (pattern weights + 1 at the diagonal): A[c, p] lookups
            gval = y  # (n, k+1) aligned with `full`
            a_cp = lookup(
                A,
                jnp.broadcast_to(cand[:, :, None], cand.shape + (full.shape[1],)),
                jnp.broadcast_to(full[:, None, :], cand.shape + (full.shape[1],)),
            )  # (n, C, k+1)
            kap = jnp.abs(jnp.einsum("ncp,np->nc", a_cp, gval))
            kap = jnp.where((cand >= 0) & improved[:, None], kap, -1.0)
            # dedupe candidate columns (keep max kap per col) then take the
            # max_step_size best: merge by column with max-combine via
            # sorting on (-kap) after a dedup merge of kap values
            mc, mv, _ = merge_slab(cand, kap, cand.shape[1])
            # merge sums duplicates — rescore merged candidates instead:
            # a duplicate col has identical kap, so divide by its count
            cnt, _, _ = merge_slab(cand, jnp.ones_like(kap), cand.shape[1])
            mv = jnp.where(cnt > 0, mv / jnp.where(cnt > 0, cnt, 1.0), -1.0)
            order = jnp.argsort(-jnp.where(mc >= 0, mv, -jnp.inf), axis=1)
            take = jnp.take_along_axis(mc, order[:, : self.max_step_size], axis=1)
            lo = step * self.max_step_size
            pattern = jax.lax.dynamic_update_slice_in_dim(
                pattern, take.astype(jnp.int32), lo, axis=1
            )

        scale = 1.0 / jnp.sqrt(jnp.maximum(yi, 1e-300))
        vals = jnp.where(full >= 0, y * scale[:, None], 0.0)
        self.G = EllMatrix(vals=vals, cols=full, n_cols=A.n_cols)
        return self

    def precond(self):
        """M r = G^T (G r)  (par_fsai_solve.c applies the same pair)."""
        G = self.G
        assert G is not None, "call setup(A) first"
        return lambda r: ell_spmv_t(G, ell_spmv(G, r))
