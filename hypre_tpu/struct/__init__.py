"""Structured-grid layer — hypre's struct_mv + struct_ls, redesigned for TPU.

hypre represents a structured grid as a set of boxes with ghost zones, a
stencil as an offset list, and a matrix as per-box coefficient arrays; its
kernels are BoxLoop macros with pluggable backends and its halo exchange is a
hand-built pack/Isend/unpack engine (``struct_mv/struct_communication.c``).

On TPU all of that collapses into dense-array algebra:

- a grid box is a dense ``jax.Array`` (``StructVector`` IS an array);
- a stencil apply is a sum of shifted, coefficient-weighted copies — XLA
  fuses it into a single HBM pass (the BoxLoop equivalent);
- halo exchange is XLA's SPMD partitioner: shard the array over a mesh and
  shifted slices lower to collective-permutes automatically (the CommPkg
  equivalent);
- Galerkin coarse operators are recovered by *probing* the composed
  R·A·P operator with lattice indicator vectors — exact, boundary-correct,
  and generic over any stencil shape (replaces the per-stencil hand-coded
  ``struct_ls/pfmg_setup_rap*.c`` / ``smg*_setup_rap.c`` kernels).
"""

from hypre_tpu.struct.stencil import StructStencil, star_stencil, box_stencil
from hypre_tpu.struct.matrix import (
    StructMatrix,
    struct_matvec,
    struct_matvec_t,
    struct_from_dense_coeffs,
)
from hypre_tpu.struct.probe import probe_stencil
from hypre_tpu.struct.io import (
    print_struct_matrix, print_struct_vector, print_sstruct_matrix,
    print_sstruct_vector, read_struct_matrix, read_struct_vector,
    read_sstruct_matrix, read_sstruct_vector,
)
from hypre_tpu.struct.pfmg import PFMG
from hypre_tpu.struct.sparse_msg import SparseMSG
from hypre_tpu.struct.hybrid import StructHybrid
from hypre_tpu.struct.smg import SMG
from hypre_tpu.struct.jacobi import StructJacobi
from hypre_tpu.struct.cycred import cyclic_reduction_solve
