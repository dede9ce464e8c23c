"""Maxwell — semi-structured edge-element solver (``sstruct_ls/maxwell_*.c``).

hypre's SStruct Maxwell solver (HYPRE_SStructMaxwellCreate,
``sstruct_ls/HYPRE_sstruct_ls.h:572``) takes an edge curl-curl system on a
semi-structured grid and — unlike AMS, where the user supplies the discrete
gradient — derives the gradient topology and the node coordinates from the
grid itself (``sstruct_ls/maxwell_grad.c`` hypre_Maxwell_Grad), then runs an
edge/nodal two-space multigrid (``maxwell_TV_setup.c``, cycle in
``maxwell_solve.c``).

TPU formulation: each part's shape is read as its NODE grid; edges connect
adjacent nodes per direction, ordered direction-major/lexicographic within a
part and part-major globally. ``maxwell_grad`` assembles the global
edge x node incidence G and the node coordinates (per-part ``rfactors``
scale the spacing, HYPRE_SStructMaxwellSetRfactors' AMR refinement), and the
solver preconditions PCG with the AMS auxiliary-space cycle on (A, G,
coords) — the same Hiptmair decomposition hypre's Maxwell implements with
its own nodal_TV machinery. Inter-part couplings ride the edge matrix's
unstructured entries; the gradient stays part-local (the reference couples
parts through its own AMR intercommunication layer,
``sstruct_amr_intercommunication.c``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.ams import AMS
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_spmv
from hypre_tpu.sstruct.grid import SStructGrid


def part_edge_counts(shape: Sequence[int]) -> list[int]:
    """Edges per direction for a node grid `shape` (d-dim box)."""
    shape = tuple(shape)
    out = []
    for d in range(len(shape)):
        dims = list(shape)
        dims[d] -= 1
        out.append(int(np.prod(dims)))
    return out


def maxwell_grad(
    grid: SStructGrid, rfactors: Optional[Sequence[float]] = None
) -> tuple[EllMatrix, np.ndarray]:
    """Discrete gradient G (global edges x global nodes) + node coordinates
    from the grid topology (hypre_Maxwell_Grad, maxwell_grad.c): G[e, head]
    = +1, G[e, tail] = -1 for each edge between adjacent nodes.

    rfactors[p] scales part p's node spacing (1/refinement), the role of
    HYPRE_SStructMaxwellSetRfactors.
    """
    ndim = len(grid.part_shapes[0])
    rows, cols, vals = [], [], []
    coords = []
    edge_off = 0
    node_off = 0
    for p, shape in enumerate(grid.part_shapes):
        h = 1.0 / float(rfactors[p]) if rfactors is not None else 1.0
        strides = np.cumprod([1] + list(shape[::-1]))[:-1][::-1]  # C-order

        def node(idx):
            return node_off + int(np.dot(idx, strides))

        for d in range(ndim):
            dims = list(shape)
            dims[d] -= 1
            for idx in np.ndindex(*dims):
                tail = node(idx)
                head_idx = list(idx)
                head_idx[d] += 1
                head = node(head_idx)
                rows += [edge_off, edge_off]
                cols += [head, tail]
                vals += [1.0, -1.0]
                edge_off += 1
        for idx in np.ndindex(*shape):
            coords.append([h * i for i in idx])
        node_off += int(np.prod(shape))
    G = HostCSR.from_coo(rows, cols, np.asarray(vals), (edge_off, node_off))
    return csr_to_ell(G), np.asarray(coords)


@dataclasses.dataclass
class Maxwell:
    """HYPRE_SStructMaxwellCreate/Setup/Solve object protocol
    (``HYPRE_sstruct_ls.h:572``; setup = maxwell_TV_setup.c, solve =
    maxwell_solve.c). ``A`` is the assembled edge system over the grid's
    global edge space (part-major, direction-major within a part — the
    ordering ``maxwell_grad`` defines)."""

    rfactors: Optional[Sequence[float]] = None
    smooth_sweeps: int = 1
    amg_knobs: Optional[dict] = None

    A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    ams: Optional[AMS] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix, grid: SStructGrid) -> "Maxwell":
        G, coords = maxwell_grad(grid, self.rfactors)
        if A.n_rows != G.n_rows:
            raise ValueError(
                f"edge matrix has {A.n_rows} rows but the grid defines "
                f"{G.n_rows} edges"
            )
        self.A = A
        self.ams = AMS(
            smooth_sweeps=self.smooth_sweeps, amg_knobs=self.amg_knobs
        ).setup(A, G, coords)
        return self

    def precond(self):
        return self.ams.precond()

    def solve(self, b: jax.Array, x0=None, rtol: float = 1e-8,
              maxiter: int = 200):
        """PCG preconditioned by the auxiliary-space cycle (the reference
        drives its Maxwell cycle as a standalone iteration; wrapping it in
        CG is the stronger, standard usage and what its own tests do via
        HYPRE_SStructPCGSetPrecond)."""
        from hypre_tpu.krylov.pcg import pcg

        A = self.A
        return pcg(lambda v: ell_spmv(A, v), b, x0=x0, M=self.precond(),
                   rtol=rtol, maxiter=maxiter)
