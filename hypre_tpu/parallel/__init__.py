from hypre_tpu.parallel.par_ell import ParEllMatrix, par_spmv, par_spmv_t, partition_ell
from hypre_tpu.parallel.mesh import make_mesh, row_sharding, replicated_sharding
