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

Symmetric-pattern v1: J_i = pattern of row i of A (nonsymmetric A supported;
thresholded A^2 patterns are a planned extension — hypre's ``nlevels``/
``thresh`` knobs).
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

    filter: float = 0.0  # drop |m_ij| below filter * max|row| after solve

    M: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "ParaSails":
        B = ell_spgemm(A, ell_transpose(A))  # A A^T (SPD Gram matrix)
        pattern = A.cols  # (n, k) — row pattern of A
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
        M = self.M
        assert M is not None, "call setup(A) first"
        return lambda r: ell_spmv(M, r)
