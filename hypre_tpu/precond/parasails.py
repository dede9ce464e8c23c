"""ParaSails-style sparse approximate inverse (distributed_ls/ParaSails/).

hypre's ParaSails builds M ~= A^{-1} by minimizing ||I - M A||_F row by row
over a thresholded power-of-A pattern, gathering remote rows and solving
dense least-squares per row (``ParaSails.c``, ``PrunedRows.c``). The TPU
formulation solves the same row problems through the normal equations:

    min_{m_i supported on J_i} || e_i - m_i A ||_2
    =>  (A A^T)[J_i, J_i] m_i^T = (A^T)[J_i, i] = A[i, J_i]^T

B = A A^T is formed once with the device SpGEMM; every row then gathers
B[J_i, J_i] and solves — one batched (n, k, k) solve, no remote-row dance
(the gather IS the communication, handled by XLA sharding).

Pattern selection follows hypre's knobs (``HYPRE_ParaSailsCreate``):
``thresh`` drops weak couplings first (|a_ij| < thresh*sqrt(|a_ii a_jj|),
ParaSails.c's prune pass), ``nlevels`` expands the pruned pattern through
that many sparsified-matrix products (pattern of Atilde^(nlevels+1)), with
the candidate set capped to ``pattern_cap`` by the product magnitudes
(playing the role of ParaSails' LoadBal.c bounds), and ``filter`` drops
small entries of the computed M afterwards.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.precond.common import gather_submatrices
from hypre_tpu.seq.ell import EllMatrix, ell_spmv
from hypre_tpu.seq.spgemm import ell_spgemm, ell_transpose


@dataclasses.dataclass
class ParaSails:
    """HYPRE_ParaSails* object protocol (HYPRE_parcsr_ls.h:1658)."""

    thresh: float = 0.0  # pre-prune weak couplings (hypre thresh)
    nlevels: int = 0  # pattern power levels (hypre nlevels)
    filter: float = 0.0  # drop |m_ij| below filter * max|row| after solve
    pattern_cap: int = 24  # max pattern width after expansion

    M: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)

    def _pattern(self, A: EllMatrix) -> "jax.Array":
        from hypre_tpu.core.config import PAD_COL
        from hypre_tpu.seq.slabops import cap_slab, merge_slab

        cols, avals = A.cols, jnp.abs(A.vals)
        if self.thresh > 0.0:
            diag = jnp.abs(A.diagonal())
            dj = jnp.where(cols >= 0, diag[jnp.maximum(cols, 0)], 1.0)
            rows = jnp.arange(A.n_rows, dtype=cols.dtype)[:, None]
            keep = (cols >= 0) & (
                (cols == rows)
                | (avals >= self.thresh * jnp.sqrt(diag[:, None] * dj))
            )
            cols = jnp.where(keep, cols, PAD_COL)
            avals = jnp.where(keep, avals, 0.0)
        pc, pv = cols, avals
        for _ in range(max(self.nlevels, 0)):
            # pattern product with |values| as significance scores
            gb_c = cols[jnp.maximum(pc, 0)]
            gb_v = avals[jnp.maximum(pc, 0)]
            n, kp = pc.shape
            kA = cols.shape[1]
            valid = (pc >= 0)[:, :, None] & (gb_c >= 0)
            cand_c = jnp.where(valid, gb_c, PAD_COL).reshape(n, kp * kA)
            cand_v = jnp.where(valid, pv[:, :, None] * gb_v, 0.0).reshape(
                n, kp * kA
            )
            cand_c = jnp.concatenate([pc, cand_c], axis=1)
            cand_v = jnp.concatenate([pv, cand_v], axis=1)
            pc, pv, _ = merge_slab(cand_c, cand_v, cand_c.shape[1])
            pc, pv = cap_slab(pc, pv, self.pattern_cap)
        return pc

    def setup(self, A) -> "ParaSails":
        from hypre_tpu.parallel.par_ell import ParEllMatrix

        if isinstance(A, ParEllMatrix):
            # TRUE distributed path: remote-row fetch + local normal
            # equations (precond/par_sails.py — ParaSails.c/PrunedRows.c's
            # remote-row exchange)
            from hypre_tpu.precond.par_sails import ParSails

            self._par = ParSails(thresh=self.thresh).setup(A)
            return self
        self._par = None
        B = ell_spgemm(A, ell_transpose(A))  # A A^T (SPD Gram matrix)
        pattern = self._pattern(A)  # (n, kp) thresholded power pattern
        sub = gather_submatrices(B, pattern)  # (n, k, k)
        # normal-equations rhs: (A e_i)[J_i] = A[J_i, i], the COLUMN of A
        from hypre_tpu.precond.common import lookup

        n = A.n_rows
        row_ids = jnp.broadcast_to(
            jnp.arange(n, dtype=pattern.dtype)[:, None], pattern.shape
        )
        rhs = lookup(A, pattern, row_ids)  # A[J_i, i]
        m = jnp.linalg.solve(sub, rhs[..., None])[..., 0]
        m = jnp.where(pattern >= 0, m, 0.0)
        if self.filter > 0.0:
            cap = self.filter * jnp.max(jnp.abs(m), axis=1, keepdims=True)
            m = jnp.where(jnp.abs(m) >= cap, m, 0.0)
        self.M = EllMatrix(vals=m, cols=pattern, n_cols=A.n_cols)
        return self

    def precond(self):
        if getattr(self, "_par", None) is not None:
            return self._par.precond()
        M = self.M
        assert M is not None, "call setup(A) first"
        return lambda r: ell_spmv(M, r)
