import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from hypre_tpu.krylov import pcg
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.struct import SMG
from hypre_tpu.struct.matrix import struct_matvec

for shape in [(32, 32), (32, 32, 1)]:
    A = struct_laplacian(shape)
    for interp in ("collapsed", "plane"):
        smg = SMG(interp=interp).setup(A)
        M = smg.precond()
        b = jnp.ones(shape)
        x, info = pcg(
            lambda v: struct_matvec(A, v.reshape(shape)).reshape(-1),
            b.reshape(-1), M=lambda r: M(r.reshape(shape)).reshape(-1),
            rtol=1e-8, maxiter=100)
        print(shape, interp, int(info.iterations), float(info.relative_residual), flush=True)
