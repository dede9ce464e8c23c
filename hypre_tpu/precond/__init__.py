"""Algebraic preconditioners beyond AMG — hypre's parcsr_ls/distributed_ls
approximate-inverse and ILU families, re-formulated as batched dense
sub-problems (the TPU-native shape: every row's local solve is a small MXU
matmul/Cholesky in one vmapped kernel, replacing hypre's per-row loops in
``par_fsai_setup.c``, ``ParaSails/``, ``par_ilu_setup.c``, ``schwarz.c``).
"""

from hypre_tpu.precond.fsai import FSAI
from hypre_tpu.precond.parasails import ParaSails
from hypre_tpu.precond.ilu import ILU, ILUT
from hypre_tpu.precond.euclid import Euclid, PILUT
from hypre_tpu.precond.schwarz import Schwarz
from hypre_tpu.precond.ilu_schur import ILUSchurGMRES, ILUSchurNSH
from hypre_tpu.precond.poly import PolyPrecond
from hypre_tpu.precond.saddle import BlockPrecond, SaddleSystem, Uzawa
from hypre_tpu.precond.par_ilu import ParILU
from hypre_tpu.precond.ic import DDICT, DDILUT, IC
from hypre_tpu.precond.par_sails import ParSails
