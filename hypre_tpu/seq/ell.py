"""EllMatrix — the on-device static-shape sparse format.

TPU-native replacement for hypre's ``hypre_CSRMatrix``
(``seq_mv/csr_matrix.h:33-55``). XLA requires static shapes, so exact-nnz CSR
is unusable on device; ELL (a dense ``(n_rows, k)`` slab of values plus a
matching slab of column indices, rows padded to the max row-nnz ``k``) is the
idiomatic choice:

- SpMV is a dense gather + row reduction — pure VPU work at HBM-bandwidth,
  no indirection through row pointers (hypre's CSR row loop,
  ``seq_mv/csr_matvec.c:699``, vectorizes poorly on wide SIMD);
- the stencil matrices multigrid lives on have *uniform* row nnz (5/7/9/27),
  so the ELL padding overhead is near zero exactly where performance matters;
- every structural op (transpose, SpGEMM, masking) becomes a static-shape
  sort/segment problem that XLA can fuse and tile.

Padding convention: unused slots hold ``cols == PAD_COL (-1)`` and
``vals == 0``. Numeric kernels may simply clip the index (the zero value makes
the contribution inert); structural kernels mask with ``cols >= 0``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.core.config import PAD_COL, default_real_dtype
from hypre_tpu.seq.csr import HostCSR


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Static-shape ELL sparse matrix.

    vals: (n_rows, k) real — padded entries are 0.
    cols: (n_rows, k) int32 — padded entries are PAD_COL.
    n_cols: static int — logical column-space size.
    """

    vals: jax.Array
    cols: jax.Array
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    # optional structural annotation: cols[i, s] == i + shifts[s] at every
    # valid slot (boundary-truncated stencil in lexicographic order). Set
    # by the stencil problem generators; lets the device setup path replace
    # every setup-phase gather/scatter with rolls (seq/slabops.py). Purely
    # advisory — kernels must treat None as "no structure".
    shifts: Optional[tuple] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    @property
    def n_rows(self) -> int:
        return self.vals.shape[0]

    @property
    def k(self) -> int:
        return self.vals.shape[1]

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.vals.dtype

    def structural_mask(self) -> jax.Array:
        return self.cols >= 0

    def nnz(self) -> jax.Array:
        return jnp.sum(self.structural_mask())

    # -- row-local queries used throughout AMG setup -------------------------

    def diagonal(self) -> jax.Array:
        """d_i = sum of entries with col == row (hypre CSR keeps the diagonal
        first; we make no ordering assumption)."""
        row_ids = jnp.arange(self.n_rows, dtype=self.cols.dtype)[:, None]
        return jnp.sum(jnp.where(self.cols == row_ids, self.vals, 0), axis=1)

    def row_sums(self) -> jax.Array:
        return jnp.sum(self.vals, axis=1)

    def abs_row_sums(self) -> jax.Array:
        return jnp.sum(jnp.abs(self.vals), axis=1)

    def offdiag_mask(self) -> jax.Array:
        row_ids = jnp.arange(self.n_rows, dtype=self.cols.dtype)[:, None]
        return (self.cols != row_ids) & self.structural_mask()

    def scale_rows(self, s: jax.Array) -> "EllMatrix":
        return dataclasses.replace(self, vals=self.vals * s[:, None])

    def with_vals(self, vals: jax.Array) -> "EllMatrix":
        return dataclasses.replace(self, vals=vals)

    # -- operator protocol (shared with ParEllMatrix so multigrid cycles and
    #    smoothers are distribution-agnostic, like hypre's matvec vtable
    #    HYPRE_MatvecFunctions.h) ---------------------------------------------

    @property
    def vec_len_rows(self) -> int:
        """Length of a compatible row-space vector (padded length for the
        distributed subclass)."""
        return self.n_rows

    @property
    def vec_len_cols(self) -> int:
        return self.n_cols

    def mv(self, x: jax.Array) -> jax.Array:
        return ell_spmv(self, x)

    def mv_t(self, x: jax.Array) -> jax.Array:
        return ell_spmv_t(self, x)


# ---------------------------------------------------------------------------
# SpMV — THE hot kernel (hypre_CSRMatrixMatvec, seq_mv/csr_matvec.c:699)
# ---------------------------------------------------------------------------


def ell_spmv(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x. Gather + row-reduce; XLA fuses this into one HBM pass."""
    if x.shape[0] != A.n_cols:
        raise ValueError(f"shape mismatch: A is {A.shape}, x has {x.shape[0]} rows")
    gathered = jnp.take(x, jnp.maximum(A.cols, 0), axis=0)
    if x.ndim == 1:
        return jnp.sum(A.vals * gathered, axis=1)
    # multivector (n, k, nvec): hypre vector_batched.c analogue
    return jnp.sum(A.vals[:, :, None] * gathered, axis=1)


def ell_spmv_t(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A.T @ x via scatter-add (hypre_CSRMatrixMatvecT)."""
    if x.shape[0] != A.n_rows:
        raise ValueError(f"shape mismatch: A.T is {A.shape[::-1]}, x has {x.shape[0]} rows")
    cols = jnp.maximum(A.cols, 0).reshape(-1)
    contrib = (A.vals * x[:, None]).reshape(-1)
    return jnp.zeros((A.n_cols,), dtype=contrib.dtype).at[cols].add(
        jnp.where(A.cols.reshape(-1) >= 0, contrib, 0)
    )


# ---------------------------------------------------------------------------
# Host conversion
# ---------------------------------------------------------------------------


def csr_to_ell(csr: HostCSR, k: int | None = None, dtype=None) -> EllMatrix:
    """Pad host CSR rows to width k (defaults to max row nnz)."""
    dtype = dtype or default_real_dtype()
    n = csr.n_rows
    if k is None:
        k = max(csr.max_row_nnz(), 1)
    vals = np.zeros((n, k), dtype=dtype)
    cols = np.full((n, k), PAD_COL, dtype=np.int32)
    row_nnz = csr.row_nnz()
    if int(row_nnz.max(initial=0)) > k:
        raise ValueError(f"row nnz {int(row_nnz.max())} exceeds ELL width {k}")
    # vectorized fill: position of each nnz within its row
    rows = np.repeat(np.arange(n), row_nnz)
    within = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], row_nnz)
    vals[rows, within] = csr.data
    cols[rows, within] = csr.indices
    return EllMatrix(vals=jnp.asarray(vals), cols=jnp.asarray(cols), n_cols=csr.shape[1])


def ell_to_csr(A: EllMatrix) -> HostCSR:
    """Device ELL -> host CSR (test oracle path)."""
    vals = np.asarray(A.vals)
    cols = np.asarray(A.cols)
    mask = cols >= 0
    rows = np.repeat(np.arange(A.n_rows), A.k).reshape(A.n_rows, A.k)
    return HostCSR.from_coo(
        rows[mask], cols[mask], vals[mask], (A.n_rows, A.n_cols), sum_duplicates=True
    )


def ell_from_dense(M: np.ndarray, k: int | None = None) -> EllMatrix:
    n, m = M.shape
    rows, cols = np.nonzero(M)
    return csr_to_ell(
        HostCSR.from_coo(rows, cols, M[rows, cols], (n, m)), k=k, dtype=M.dtype
    )
