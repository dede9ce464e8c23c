"""hypre_tpu — a TPU-native sparse linear-algebra and multigrid solver library.

Built from scratch in JAX/XLA/Pallas with the capabilities of hypre (LLNL's
library of parallel preconditioners and sparse solvers, see
/root/reference/README.md:12-15) but an idiomatic TPU architecture:

- row-sharded sparse matrices in a static-shape ELL format (hypre's ParCSR
  diag/offd split, ``parcsr_mv/par_csr_matrix.h:27-86``, reimagined as
  precomputed halo-gather schedules executed as ICI collectives),
- a matrix-free Krylov suite (PCG, GMRES, FlexGMRES, BiCGSTAB, ...) mirroring
  ``krylov/`` (vtable protocol at ``krylov/pcg.h:49-70``),
- BoomerAMG-style algebraic multigrid (strength -> PMIS coarsening ->
  interpolation -> Galerkin RAP -> V/W/F cycles, ``parcsr_ls/par_amg_setup.c``),
- PFMG/SMG-style structured-grid multigrid on dense box arrays
  (``struct_ls/pfmg_setup.c``), where XLA's SPMD partitioner plays the role of
  hypre's struct CommPkg.

Everything in the solve path is jit-compatible with static shapes; irregular
setup analysis runs on host and bakes static index maps into the jitted fns.
"""

from hypre_tpu.core.config import (
    default_real_dtype,
    default_int_dtype,
    ConvergenceInfo,
)
from hypre_tpu.seq.ell import EllMatrix, ell_spmv, csr_to_ell
from hypre_tpu.problems.laplacian import (
    laplacian_2d_5pt,
    laplacian_2d_9pt,
    laplacian_3d_7pt,
    laplacian_3d_27pt,
)

__version__ = "0.1.0"
