"""Block-tridiagonal 2x2 preconditioner (parcsr_ls/block_tridiag.c).

For systems partitioned into two index sets (e.g. velocity/pressure), one
application performs a block forward solve

    z_1 = B_11^{-1} r_1
    z_2 = B_22^{-1} (r_2 - A_21 z_1)

with each diagonal block solved approximately by a BoomerAMG cycle —
hypre's HYPRE_BlockTridiagSetIndexSet protocol.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_spmv, ell_to_csr


def _extract(A: EllMatrix, rows: np.ndarray, cols: np.ndarray) -> EllMatrix:
    """Submatrix A[rows, cols] as a compact EllMatrix."""
    csr = ell_to_csr(A)
    rmap = -np.ones(A.n_rows, np.int64)
    rmap[rows] = np.arange(len(rows))
    cmap = -np.ones(A.n_cols, np.int64)
    cmap[cols] = np.arange(len(cols))
    rr = np.repeat(np.arange(csr.n_rows), csr.row_nnz())
    keep = (rmap[rr] >= 0) & (cmap[csr.indices] >= 0)
    sub = HostCSR.from_coo(
        rmap[rr[keep]], cmap[csr.indices[keep]], csr.data[keep],
        (len(rows), len(cols)),
    )
    return csr_to_ell(sub, dtype=A.dtype)


@dataclasses.dataclass
class BlockTridiag:
    """HYPRE_BlockTridiagCreate analogue."""

    amg_knobs: Optional[dict] = None

    def setup(self, A: EllMatrix, index_set1: np.ndarray) -> "BlockTridiag":
        n = A.n_rows
        i1 = np.asarray(index_set1, np.int64)
        mask = np.zeros(n, bool)
        mask[i1] = True
        i2 = np.nonzero(~mask)[0]
        self.i1, self.i2 = i1, i2
        knobs = self.amg_knobs or dict(max_coarse_size=64)
        self.A11 = _extract(A, i1, i1)
        self.A21 = _extract(A, i2, i1)
        self.A22 = _extract(A, i2, i2)
        self.B11 = BoomerAMG(**knobs).setup(self.A11)
        self.B22 = BoomerAMG(**knobs).setup(self.A22)
        self.n = n
        self._i1j = jnp.asarray(i1)
        self._i2j = jnp.asarray(i2)
        return self

    def precond(self):
        i1, i2 = self._i1j, self._i2j
        A21, B11, B22, n = self.A21, self.B11, self.B22, self.n

        def M(r):
            r1 = r[i1]
            r2 = r[i2]
            z1 = B11.cycle(r1)
            z2 = B22.cycle(r2 - ell_spmv(A21, z1))
            return jnp.zeros(n, r.dtype).at[i1].set(z1).at[i2].set(z2)

        return M
