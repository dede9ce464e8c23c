"""BsrMatrix — block-sparse (block-ELL) storage for nodal systems.

Analogue of hypre's ParCSRBlockMatrix (``parcsr_block_mv/
par_csr_block_matrix.h``), used for systems PDEs where unknowns group per
node. The TPU formulation stores dense (bs x bs) blocks in a block-ELL slab
so the matvec's inner operation is a batched dense block-vector product —
MXU work instead of scalar indexing:

    y[I] = sum_k  bvals[I, k] @ x[bcols[I, k]]      (einsum over blocks)

Block AMG (nodal coarsening/interp) composes on top in later rounds; this
layer provides storage, conversion, matvec, block-diagonal inversion (the
block-Jacobi smoother hypre's nodal mode uses), and scalar<->block
round-trips.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.core.config import PAD_COL
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_to_csr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BsrMatrix:
    """Block-ELL: bvals (nbrows, k, bs, bs); bcols (nbrows, k) block cols."""

    bvals: jax.Array
    bcols: jax.Array
    n_bcols: int = dataclasses.field(metadata=dict(static=True))

    @property
    def block_size(self) -> int:
        return self.bvals.shape[-1]

    @property
    def n_brows(self) -> int:
        return self.bvals.shape[0]

    @property
    def n_rows(self) -> int:
        return self.n_brows * self.block_size

    @property
    def n_cols(self) -> int:
        return self.n_bcols * self.block_size

    @property
    def dtype(self):
        return self.bvals.dtype

    def mv(self, x: jax.Array) -> jax.Array:
        """y = A @ x (x flat, scalar-indexed)."""
        bs = self.block_size
        xb = x.reshape(self.n_bcols, bs)
        g = jnp.take(xb, jnp.maximum(self.bcols, 0), axis=0)  # (nb, k, bs)
        g = jnp.where((self.bcols >= 0)[..., None], g, 0.0)
        y = jnp.einsum("nkab,nkb->na", self.bvals, g)
        return y.reshape(-1)

    def block_diagonal(self) -> jax.Array:
        """(nb, bs, bs) diagonal blocks."""
        row_ids = jnp.arange(self.n_brows)[:, None]
        hit = (self.bcols == row_ids)[..., None, None]
        return jnp.sum(jnp.where(hit, self.bvals, 0.0), axis=1)

    def block_jacobi_precond(self):
        """Batched inverse of the diagonal blocks — hypre's nodal block
        smoother (par_csr_block_relax.c)."""
        inv = jnp.linalg.inv(self.block_diagonal())
        bs = self.block_size

        def M(r):
            rb = r.reshape(self.n_brows, bs)
            return jnp.einsum("nab,nb->na", inv, rb).reshape(-1)

        return M

    def to_ell(self) -> EllMatrix:
        """Scalar view (block entries expanded)."""
        bs = self.block_size
        nb, k = self.bcols.shape
        bvals = np.asarray(self.bvals)
        bcols = np.asarray(self.bcols)
        rows, cols, vals = [], [], []
        for a in range(bs):
            for c in range(bs):
                m = bcols >= 0
                I, K = np.nonzero(m)
                rows.append(I * bs + a)
                cols.append(bcols[I, K] * bs + c)
                vals.append(bvals[I, K, a, c])
        csr = HostCSR.from_coo(
            np.concatenate(rows), np.concatenate(cols), np.concatenate(vals),
            (self.n_rows, self.n_cols),
        )
        return csr_to_ell(csr, dtype=self.dtype)


def ell_to_bsr(A: EllMatrix, block_size: int) -> BsrMatrix:
    """Group a scalar matrix into (bs x bs) blocks (hypre
    ParCSRBlockMatrixConvertFromParCSRMatrix)."""
    bs = block_size
    if A.n_rows % bs or A.n_cols % bs:
        raise ValueError("matrix dims must be divisible by block_size")
    csr = ell_to_csr(A)
    rows = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    brow = rows // bs
    bcol = csr.indices // bs
    # unique (brow, bcol) pairs define the block pattern
    key = brow * (A.n_cols // bs) + bcol
    uniq, inv = np.unique(
        np.stack([brow, bcol], axis=1), axis=0, return_inverse=True
    )
    nb = A.n_rows // bs
    counts = np.bincount(uniq[:, 0], minlength=nb)
    k = max(int(counts.max(initial=0)), 1)
    bvals = np.zeros((nb, k, bs, bs), np.asarray(csr.data).dtype)
    bcols = np.full((nb, k), PAD_COL, np.int32)
    slot_of = np.zeros(len(uniq), np.int32)
    next_slot = np.zeros(nb, np.int32)
    for u, (br, bc) in enumerate(uniq):
        slot_of[u] = next_slot[br]
        bcols[br, next_slot[br]] = bc
        next_slot[br] += 1
    np.add.at(
        bvals,
        (brow, slot_of[inv], rows % bs, csr.indices % bs),
        csr.data,
    )
    return BsrMatrix(
        bvals=jnp.asarray(bvals), bcols=jnp.asarray(bcols), n_bcols=A.n_cols // bs
    )
