from hypre_tpu.krylov.pcg import pcg
from hypre_tpu.krylov.gmres import gmres
from hypre_tpu.krylov.bicgstab import bicgstab
from hypre_tpu.krylov.flexgmres import flexgmres
from hypre_tpu.krylov.lgmres import lgmres
from hypre_tpu.krylov.cogmres import cogmres
from hypre_tpu.krylov.cgnr import cgnr
from hypre_tpu.krylov.lobpcg import lobpcg, block_op
