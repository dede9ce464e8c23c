"""Incomplete Cholesky and the domain-decomposed DDICT/DDILUT shells.

Analogues of the LSI one-off preconditioners
``FEI_mv/fei-hypre/HYPRE_LSI_ddict.c`` (distributed incomplete Cholesky
with per-processor subdomains + overlap rows) and ``HYPRE_LSI_ddilut.c``
(same structure around ILUT). The reference's "DD" structure — each
processor factors its local rows after receiving overlap rows from
neighbors, dropping couplings beyond the overlap — maps to a
block-diagonal-with-overlap pattern restriction here (the shard image of
a rank), factored by the fine-grained fixed-point kernels.

The IC fixed point mirrors the Chow-Patel ILU one on the symmetric
lower pattern:

    l_ij = (a_ij - sum_{k<j} l_ik l_jk) / l_jj   (j < i)
    l_ii = sqrt(a_ii - sum_{k<i} l_ik^2)

iterated over all entries simultaneously — every sweep is one
gather/einsum pass on the static ELL pattern, and application is
Jacobi-iterated triangular solves with L and L^T (all TPU-regular).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.seq.ell import EllMatrix, ell_spmv


def _ic_sweeps(A: EllMatrix, sweeps: int) -> jax.Array:
    """Fixed-point incomplete Cholesky on A's lower pattern. Returns F
    aligned with A.cols: L entries on the strictly-lower + diagonal
    positions (zero elsewhere)."""
    n, k = A.cols.shape
    cols = A.cols
    rows = jnp.arange(n, dtype=cols.dtype)[:, None]
    is_low = (cols >= 0) & (cols < rows)
    is_diag = cols == rows
    rsafe = jnp.maximum(cols, 0)

    def sweep(F, _):
        # neighbor-row factor rows: nv[i,a,s] = F[c_a, s], their cols
        nv = F[rsafe]
        nc = cols[rsafe]
        # L(i, c_k) aligned as F masked to lower+diag of row i
        Lik = jnp.where(is_low, F, 0.0)
        # match row-j entries to row-i entries by column id: the inner sum
        # sum_k l_ik l_jk with k < j = c_a
        match = (nc[:, :, None, :] == cols[:, None, :, None]).astype(F.dtype)
        # l_j entries of row c_a restricted to k < c_a (strictly lower)
        jlow = (nc < rsafe[:, :, None]) & (nc >= 0)
        jv = jnp.where(jlow, nv, 0.0)
        Sab = jnp.einsum("nas,nabs->nab", jv, match)  # (i, a, b): l_{c_a, c_b}
        korder = (cols[:, :, None] > cols[:, None, :]).astype(F.dtype)
        # but also k < j(c_a) handled by jlow; need k < j only, plus k
        # appearing in row i: sum over b of Lik[b] * l_{c_a, c_b}
        S = jnp.einsum("nb,nab,nab->na", Lik, Sab, korder)
        dL = jnp.sum(jnp.where(is_diag, F, 0.0), axis=1)
        dL = jnp.where(dL != 0, dL, 1.0)
        new_low = (A.vals - S) / dL[rsafe]
        # diagonal: sqrt(a_ii - sum_k l_ik^2), clamped SPD-safe
        sq = jnp.sum(jnp.where(is_low, F * F, 0.0), axis=1)
        a_ii = jnp.sum(jnp.where(is_diag, A.vals, 0.0), axis=1)
        new_diag = jnp.sqrt(jnp.maximum(a_ii - sq, 1e-12))
        F = jnp.where(
            is_low, new_low,
            jnp.where(is_diag, new_diag[:, None] * is_diag, 0.0),
        )
        return F, None

    # init: scaled lower of A, diag = sqrt(a_ii)
    a_ii = jnp.sum(jnp.where(is_diag, A.vals, 0.0), axis=1)
    d0 = jnp.sqrt(jnp.maximum(a_ii, 1e-12))
    F0 = jnp.where(
        is_low, A.vals / d0[rsafe],
        jnp.where(is_diag, d0[:, None] * is_diag, 0.0),
    )
    F, _ = jax.lax.scan(sweep, F0, None, length=sweeps)
    return F


@dataclasses.dataclass
class IC:
    """Incomplete Cholesky IC(0): M = L L^T on A's lower pattern."""

    factor_sweeps: int = 8
    solve_sweeps: int = 8

    L: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    Lt: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    dinv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "IC":
        from hypre_tpu.seq.spgemm import ell_transpose

        F = _ic_sweeps(A, self.factor_sweeps)
        n = A.n_rows
        rows = jnp.arange(n, dtype=A.cols.dtype)[:, None]
        is_low = (A.cols >= 0) & (A.cols < rows)
        is_diag = A.cols == rows
        diag = jnp.sum(jnp.where(is_diag, F, 0.0), axis=1)
        self.dinv = 1.0 / jnp.where(diag != 0, diag, 1.0)
        # strictly-lower L (unit-free; the diagonal is applied separately)
        self.L = EllMatrix(
            vals=jnp.where(is_low, F, 0.0),
            cols=jnp.where(is_low, A.cols, -1),
            n_cols=n,
        )
        self.Lt = ell_transpose(self.L)
        return self

    def precond(self):
        L, Lt, dinv = self.L, self.Lt, self.dinv
        m = self.solve_sweeps

        def M(r):
            # forward: (L + D) y = r by Jacobi iteration
            y = dinv * r
            for _ in range(m):
                y = dinv * (r - ell_spmv(L, y))
            # backward: (D + L^T) x = y
            x = dinv * y
            for _ in range(m):
                x = dinv * (y - ell_spmv(Lt, x))
            return x

        return M


@dataclasses.dataclass
class DDICT(IC):
    """HYPRE_LSI_DDICTCreate analogue: domain-decomposed incomplete
    Cholesky — IC over per-subdomain diagonal blocks with ``overlap``
    extra coupled rows per boundary (the reference receives that many
    overlap rows from neighbors, HYPRE_LSI_ddict.c)."""

    num_subdomains: int = 4
    overlap: int = 2
    fillin: float = 0.0   # -ddictFillin: relative extra-fill knob (pattern
    # growth is not needed by the fixed-point kernel; kept for API parity)
    threshold: float = 0.0  # -ddictDropTol pre-drop

    def setup(self, A: EllMatrix) -> "DDICT":
        A = _overlap_block_pattern(
            A, self.num_subdomains, self.overlap, self.threshold
        )
        super().setup(A)
        return self


def _overlap_block_pattern(
    A: EllMatrix, nblocks: int, overlap: int, drop_tol: float
) -> EllMatrix:
    """Restrict A to block-diagonal-with-overlap: keep (i, j) when i and j
    fall in the same [start - overlap, end + overlap) extended block."""
    import numpy as np

    n = A.n_rows
    bounds = np.linspace(0, n, nblocks + 1).astype(np.int64)
    block_of = np.repeat(np.arange(nblocks), np.diff(bounds))
    lo = jnp.asarray(bounds[block_of] - overlap)
    hi = jnp.asarray(bounds[block_of + 1] + overlap)
    rows = jnp.arange(n)[:, None]
    c = jnp.maximum(A.cols, 0)
    same = (A.cols >= 0) & (c >= lo[rows]) & (c < hi[rows])
    vals = A.vals
    if drop_tol > 0:
        rownorm = jnp.max(jnp.abs(jnp.where(A.cols >= 0, vals, 0.0)), axis=1)
        same = same & (
            (jnp.abs(vals) >= drop_tol * rownorm[:, None])
            | (A.cols == rows)
        )
    return EllMatrix(
        vals=jnp.where(same, vals, 0.0),
        cols=jnp.where(same, A.cols, -1),
        n_cols=A.n_cols,
    )


@dataclasses.dataclass
class DDILUT:
    """HYPRE_LSI_DDIlutCreate analogue: domain-decomposed ILUT — ILUT on
    per-subdomain blocks with overlap rows (HYPRE_LSI_ddilut.c's
    -ddilutFillin/-ddilutDropTol knobs)."""

    num_subdomains: int = 4
    overlap: int = 2
    fillin: int = 8          # max kept entries per factor row
    drop_tol: float = 1e-3   # relative drop tolerance

    _ilut: Optional[object] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "DDILUT":
        from hypre_tpu.precond.ilu import ILUT

        Ab = _overlap_block_pattern(A, self.num_subdomains, self.overlap, 0.0)
        self._ilut = ILUT(
            drop_tol=self.drop_tol, max_row_nnz=self.fillin
        ).setup(Ab)
        return self

    def precond(self):
        return self._ilut.precond()
