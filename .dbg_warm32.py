import jax, traceback
from hypre_tpu.warmup import enable_persistent_cache, warmup
import jax.numpy as jnp
from hypre_tpu.problems.laplacian import laplacian_3d_7pt
enable_persistent_cache()
A = laplacian_3d_7pt(32, 32, 32, dtype=jnp.float32)
try:
    warmup(A, repeats=1)
    print("OK")
except Exception:
    traceback.print_exc()
