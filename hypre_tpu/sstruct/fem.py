"""SStruct FEM assembly — HYPRE_SStructMatrixAddFEMValues and friends.

The reference's FEM path (``HYPRE_sstruct_matrix.c:361``,
``HYPRE_SStructGridSetFEMOrdering``) lets applications add *element*
matrices: the grid declares, per part, the element's dof list as
(variable, offset) pairs, and AddFEMValues scatters an element matrix for
the element at ``index`` into the dofs at ``index + offset``. Multiple
variables per node and inter-part shared dofs (the AMR / enhanced
connectivity cases of ex13/ex14) are handled by the grid's shared-node
identification.

TPU-native image: dofs get a global numbering at assembly time and the
system lands in the IJ layer (sorted COO -> ELL), exactly like the FEI
front end — the struct metadata exists to define dof identity, the
operator itself is unstructured (the reference also routes FEM entries
into its U-matrix).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from hypre_tpu.ij import IJMatrix
from hypre_tpu.seq.ell import EllMatrix


@dataclasses.dataclass
class SStructFEMGrid:
    """Node grids per part + per-part FEM dof ordering + shared dofs."""

    part_shapes: Sequence[tuple]  # NODE-grid shapes per part
    nvars: int = 1

    _fem_vars: Dict = dataclasses.field(default_factory=dict, repr=False)
    _fem_offsets: Dict = dataclasses.field(default_factory=dict, repr=False)
    _alias: Dict = dataclasses.field(default_factory=dict, repr=False)
    _numbering: Optional[Dict] = dataclasses.field(default=None, repr=False)

    def set_fem_ordering(self, part: int, fem_vars: Sequence[int],
                         fem_offsets: Sequence[tuple]) -> "SStructFEMGrid":
        """HYPRE_SStructGridSetFEMOrdering: the element dof list as
        (variable, node-offset) pairs, in the order element matrices use."""
        assert len(fem_vars) == len(fem_offsets)
        self._fem_vars[part] = tuple(int(v) for v in fem_vars)
        self._fem_offsets[part] = tuple(tuple(o) for o in fem_offsets)
        return self

    def share_node(self, part, index, other_part, other_index
                   ) -> "SStructFEMGrid":
        """Identify (part, index) with (other_part, other_index) for every
        variable — the SetSharedPart/neighbor-part dof identification."""
        self._alias[(part, tuple(index))] = (other_part, tuple(other_index))
        return self

    def _canon(self, part, index):
        key = (part, tuple(index))
        seen = set()
        while key in self._alias and key not in seen:
            seen.add(key)
            key = self._alias[key]
        return key

    def dof(self, part, index, var) -> int:
        """Global dof number (first-use numbering of canonical nodes)."""
        if self._numbering is None:
            self._numbering = {}
        key = self._canon(part, index) + (var,)
        if key not in self._numbering:
            self._numbering[key] = len(self._numbering)
        return self._numbering[key]

    @property
    def n_dofs(self) -> int:
        return len(self._numbering or {})


@dataclasses.dataclass
class SStructFEMMatrix:
    """AddFEMValues-accumulating assembler (HYPRE_SStructMatrix FEM mode)."""

    grid: SStructFEMGrid

    _rows: List = dataclasses.field(default_factory=list, repr=False)
    _cols: List = dataclasses.field(default_factory=list, repr=False)
    _vals: List = dataclasses.field(default_factory=list, repr=False)
    _rhs: Dict = dataclasses.field(default_factory=dict, repr=False)
    A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    b: Optional[jnp.ndarray] = dataclasses.field(default=None, repr=False)

    def _elem_dofs(self, part, index):
        fvars = self.grid._fem_vars[part]
        foffs = self.grid._fem_offsets[part]
        return [
            self.grid.dof(
                part, tuple(i + o for i, o in zip(index, off)), var
            )
            for var, off in zip(fvars, foffs)
        ]

    def add_fem_values(self, part, index, values) -> "SStructFEMMatrix":
        """HYPRE_SStructMatrixAddFEMValues: scatter the element matrix for
        the element anchored at ``index`` into its declared dofs."""
        dofs = self._elem_dofs(part, index)
        ke = np.asarray(values, float).reshape(len(dofs), len(dofs))
        for a, ra in enumerate(dofs):
            for c, cc in enumerate(dofs):
                self._rows.append(ra)
                self._cols.append(cc)
                self._vals.append(ke[a, c])
        return self

    def add_fem_rhs(self, part, index, values) -> "SStructFEMMatrix":
        """HYPRE_SStructVectorAddFEMValues for the right-hand side."""
        dofs = self._elem_dofs(part, index)
        for d, v in zip(dofs, np.asarray(values, float)):
            self._rhs[d] = self._rhs.get(d, 0.0) + float(v)
        return self

    def assemble(self, dirichlet: Sequence[int] = ()) -> "SStructFEMMatrix":
        n = self.grid.n_dofs
        ij = IJMatrix(n, n)
        ij.add_to_values(
            np.asarray(self._rows), np.asarray(self._cols),
            np.asarray(self._vals),
        )
        A = ij.assemble().get_object()
        rhs = np.zeros(n)
        for d, v in self._rhs.items():
            rhs[d] += v
        if len(dirichlet):
            rows = jnp.asarray(sorted(set(int(d) for d in dirichlet)))
            is_bc = jnp.zeros(n, bool).at[rows].set(True)
            rid = jnp.arange(n)[:, None]
            keep = ~is_bc[rid] | (A.cols == rid)
            vals = jnp.where(keep & (A.cols >= 0), A.vals, 0.0)
            vals = jnp.where((A.cols == rid) & is_bc[rid], 1.0, vals)
            colbc = (
                (A.cols >= 0)
                & is_bc[jnp.maximum(A.cols, 0)]
                & (A.cols != rid)
            )
            vals = jnp.where(colbc, 0.0, vals)
            A = EllMatrix(vals=vals, cols=A.cols, n_cols=A.n_cols)
            rhs[np.asarray(rows)] = 0.0
        self.A = A
        self.b = jnp.asarray(rhs, A.dtype)
        return self
