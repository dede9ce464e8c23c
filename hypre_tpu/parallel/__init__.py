from hypre_tpu.parallel.par_ell import ParEllMatrix, par_spmv, par_spmv_t, partition_ell
from hypre_tpu.parallel.mesh import make_mesh, row_sharding, replicated_sharding
from hypre_tpu.parallel.multihost import (
    init_multihost, shutdown_multihost, make_pod_mesh, flat_row_mesh,
    host_row_ranges,
)
