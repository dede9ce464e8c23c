from hypre_tpu.krylov.pcg import pcg
from hypre_tpu.krylov.gmres import gmres
from hypre_tpu.krylov.bicgstab import bicgstab
