"""IJ assembly interface — hypre's IJ_mv layer (HYPRE_IJMatrix/IJVector).

Mirrors the canonical assembly path (``IJ_mv/HYPRE_IJMatrix.c:23,297,681``):
Create → SetValues/AddToValues (any order, off-rank rows welcome) →
Assemble → GetObject. hypre buffers off-process contributions in an aux
matrix and ships them with a rendezvous exchange at assemble time
(``IJMatrix_parcsr.c:2503``); here assembly is a host-side sort/reduce —
the TPU design does *all* irregular discovery on host at setup and bakes
static structures (SURVEY §5) — producing an EllMatrix, or a ParEllMatrix
when a mesh is given (the row partition plays the role of the MPI ranks).

Duplicate semantics follow hypre exactly: AddToValues accumulates;
SetValues overwrites everything previously staged for that (row, col).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell


@dataclasses.dataclass
class IJMatrix:
    """HYPRE_IJMatrixCreate(comm, ilower, iupper, jlower, jupper) analogue."""

    nrows: int
    ncols: int

    def __post_init__(self):
        self._rows: list[np.ndarray] = []
        self._cols: list[np.ndarray] = []
        self._vals: list[np.ndarray] = []
        self._is_set: list[np.ndarray] = []
        self._obj = None

    def _stage(self, rows, cols, values, is_set: bool):
        rows = np.atleast_1d(np.asarray(rows, dtype=np.int64))
        cols = np.atleast_1d(np.asarray(cols, dtype=np.int64))
        values = np.atleast_1d(np.asarray(values))
        rows, cols, values = np.broadcast_arrays(rows, cols, values)
        if rows.min(initial=0) < 0 or rows.max(initial=0) >= self.nrows:
            raise ValueError("row index out of range")
        if cols.min(initial=0) < 0 or cols.max(initial=0) >= self.ncols:
            raise ValueError("col index out of range")
        self._rows.append(rows.ravel())
        self._cols.append(cols.ravel())
        self._vals.append(values.ravel())
        self._is_set.append(np.full(rows.size, is_set, dtype=bool))
        self._obj = None

    def set_values(self, rows, cols, values) -> "IJMatrix":
        """HYPRE_IJMatrixSetValues — overwrites prior entries."""
        self._stage(rows, cols, values, True)
        return self

    def add_to_values(self, rows, cols, values) -> "IJMatrix":
        """HYPRE_IJMatrixAddToValues — accumulates."""
        self._stage(rows, cols, values, False)
        return self

    def assemble(self) -> "IJMatrix":
        """HYPRE_IJMatrixAssemble: resolve set/add ordering, dedupe, build."""
        if not self._rows:
            self._obj = HostCSR.from_coo([], [], [], (self.nrows, self.ncols))
            return self
        rows = np.concatenate(self._rows)
        cols = np.concatenate(self._cols)
        vals = np.concatenate(self._vals)
        sets = np.concatenate(self._is_set)
        seq = np.arange(rows.size, dtype=np.int64)
        # per (row, col): find the latest 'set'; drop everything staged
        # before it, then sum the survivors (hypre aux-matrix semantics)
        order = np.lexsort((seq, cols, rows))
        r, c, v, s = rows[order], cols[order], vals[order], sets[order]
        is_new = np.empty(r.size, dtype=bool)
        is_new[0] = True
        is_new[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        group = np.cumsum(is_new) - 1
        # within each group entries sit in staging order; the latest 'set'
        # invalidates everything staged before it, the rest accumulate
        n = r.size
        last_set_of_group = np.full(group[-1] + 1, -1, dtype=np.int64)
        np.maximum.at(last_set_of_group, group, np.where(s, np.arange(n), -1))
        keep = np.arange(n) >= last_set_of_group[group]
        summed = np.zeros(group[-1] + 1, dtype=vals.dtype)
        np.add.at(summed, group[keep], v[keep])
        out_r = r[is_new]
        out_c = c[is_new]
        self._obj = HostCSR.from_coo(
            out_r, out_c, summed, (self.nrows, self.ncols), sum_duplicates=False
        )
        return self

    # -- GetObject ------------------------------------------------------------

    def get_csr(self) -> HostCSR:
        assert self._obj is not None, "call assemble() first"
        return self._obj

    def get_object(self, k: Optional[int] = None, dtype=None) -> EllMatrix:
        """HYPRE_IJMatrixGetObject (object_type HYPRE_PARCSR analogue)."""
        return csr_to_ell(self.get_csr(), k=k, dtype=dtype)

    def get_par_object(self, mesh, dtype=None):
        """Distributed variant: partition over a device mesh."""
        from hypre_tpu.parallel import partition_ell

        return partition_ell(self.get_object(dtype=dtype), mesh)


@dataclasses.dataclass
class IJVector:
    """HYPRE_IJVectorCreate analogue."""

    n: int
    dtype: type = np.float64

    def __post_init__(self):
        self._v = np.zeros(self.n, dtype=self.dtype)

    def set_values(self, indices, values) -> "IJVector":
        self._v[np.asarray(indices, dtype=np.int64)] = values
        return self

    def add_to_values(self, indices, values) -> "IJVector":
        np.add.at(self._v, np.asarray(indices, dtype=np.int64), values)
        return self

    def assemble(self) -> "IJVector":
        return self

    def get_object(self):
        import jax.numpy as jnp

        return jnp.asarray(self._v)
