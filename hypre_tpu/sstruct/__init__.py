"""Semi-structured layer — hypre's sstruct_mv + sstruct_ls on TPU.

hypre composes an SStruct problem from structured *parts* (each a box grid
with stencil coupling) plus a graph of non-stencil entries that land in an
unstructured ParCSR "U-matrix" (``sstruct_mv/_hypre_sstruct_mv.h:555-616``);
the matvec is per-part struct matvecs plus the U-matrix matvec accumulated
into the same result (``sstruct_mv/sstruct_matvec.c:262-319``).

The TPU formulation keeps exactly that split: parts are dense arrays with
fused stencil matvecs (the struct layer), the U-matrix is an EllMatrix over
the flat concatenated index space, and an SStructVector IS the flat vector
(parts are reshaped views). Solvers:

- Split (HYPRE_SStructSplit*, block-diagonal per-part struct solves),
- SysPFMG (sys_pfmg*.c, PFMG for multi-variable systems on one part),
- FAC (fac*.c, AMR composite grids with patch relaxation + Galerkin
  coarse correction; composite-Poisson assembly helper included),
- Maxwell (maxwell_*.c, edge curl-curl systems with the discrete gradient
  derived from the grid topology, solved through the auxiliary space),
- any Krylov solver via ``as_linear_op`` (krylov_sstruct.c glue).
"""

from hypre_tpu.sstruct.grid import SStructGrid
from hypre_tpu.sstruct.matrix import SStructMatrix
from hypre_tpu.sstruct.split import SplitSolver
from hypre_tpu.sstruct.syspfmg import SysPFMG, SysStructMatrix
from hypre_tpu.sstruct.fac import FAC
from hypre_tpu.sstruct.maxwell import Maxwell, maxwell_grad
