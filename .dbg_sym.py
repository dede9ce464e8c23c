import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp, numpy as np
from hypre_tpu.problems.struct_problems import struct_laplacian
from hypre_tpu.struct import SMG

shape = (8, 8)
A = struct_laplacian(shape)
n = 64
for interp in ("collapsed", "plane"):
    smg = SMG(interp=interp).setup(A)
    M = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n); e[i] = 1.0
        M[:, i] = np.asarray(smg.cycle(jnp.asarray(e.reshape(shape)))).reshape(-1)
    asym = np.max(np.abs(M - M.T)) / np.max(np.abs(M))
    w = np.linalg.eigvals((M + M.T) / 2)
    print(interp, "rel asym:", asym, "min eig:", w.real.min(), "max:", w.real.max(), flush=True)
