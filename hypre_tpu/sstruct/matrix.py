"""SStructMatrix — per-part stencil matrices + unstructured graph couplings.

Mirrors hypre's PMatrix/UMatrix split (``_hypre_sstruct_mv.h:555-616``):
the structured intra-part coupling lives in StructMatrix parts, everything
irregular (inter-part neighbor entries, AMR interfaces, HYPRE_SStructGraph
AddEntries) goes to a flat EllMatrix over the concatenated global index
space. ``mv`` = part stencil matvecs + U matvec (sstruct_matvec.c:262-319).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_spmv
from hypre_tpu.sstruct.grid import SStructGrid
from hypre_tpu.struct.matrix import StructMatrix, struct_matvec


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SStructMatrix:
    parts: tuple[StructMatrix, ...]
    U: Optional[EllMatrix]  # (N, N) over the flat global space; None if empty
    grid: SStructGrid = dataclasses.field(metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.grid.total_size

    @property
    def dtype(self):
        return self.parts[0].dtype

    def mv(self, x: jax.Array) -> jax.Array:
        """y = A x on the flat global vector (hypre_SStructMatvec)."""
        xs = self.grid.split(x)
        ys = [struct_matvec(P, xp).reshape(-1) for P, xp in zip(self.parts, xs)]
        y = jnp.concatenate(ys)
        if self.U is not None:
            y = y + ell_spmv(self.U, x)
        return y

    def as_linear_op(self):
        return lambda v: self.mv(v)

    def to_dense(self) -> jax.Array:
        n = self.n_rows
        eye = jnp.eye(n, dtype=self.dtype)
        return jax.vmap(self.mv, in_axes=1, out_axes=1)(eye)


class SStructGraphBuilder:
    """HYPRE_SStructGraphAddEntries analogue: collect non-stencil couplings
    ((part, index) -> (to_part, to_index) with a value set later through
    the matrix interface), then build the U EllMatrix."""

    def __init__(self, grid: SStructGrid):
        self.grid = grid
        self._rows: list[int] = []
        self._cols: list[int] = []
        self._vals: list[float] = []

    def add_entry(self, part, index, to_part, to_index, value) -> "SStructGraphBuilder":
        self._rows.append(self.grid.global_index(part, tuple(np.atleast_1d(index))))
        self._cols.append(
            self.grid.global_index(to_part, tuple(np.atleast_1d(to_index)))
        )
        self._vals.append(float(value))
        return self

    def build(self, dtype=None) -> Optional[EllMatrix]:
        if not self._rows:
            return None
        n = self.grid.total_size
        csr = HostCSR.from_coo(self._rows, self._cols, self._vals, (n, n))
        return csr_to_ell(csr, dtype=dtype)


def sstruct_matrix(
    parts: list[StructMatrix],
    grid: SStructGrid,
    graph: Optional[SStructGraphBuilder] = None,
) -> SStructMatrix:
    U = graph.build(dtype=parts[0].dtype) if graph is not None else None
    return SStructMatrix(parts=tuple(parts), U=U, grid=grid)
